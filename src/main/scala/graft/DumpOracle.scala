package graft

/** Dev tool: dump SparkEntry.oracleSql to a JSON file WITHOUT re-running
  * the 314 Spark queries (graft.Verify does both; oracle-SQL-only edits
  * iterate against an existing Verify output dir + this dump).
  * `runMain graft.DumpOracle /tmp/oracle_sql.json` */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql_new.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote ${SparkEntry.oracleSql.size} keys -> $out")
  }
}
