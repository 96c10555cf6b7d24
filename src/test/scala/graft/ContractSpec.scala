package graft

/** Driver-contract guards, cheap enough for every `sbt test` run:
  * each declared query must BUILD (analyze) against the smoke fixture —
  * catching unresolved columns, bad casts, and registry typos without
  * waiting for the driver's sf0.01 Verify round-trip — and the set of
  * queries without oracle SQL must stay exactly the documented
  * kmeans-trained / engine-specific-sketch six. */
class ContractSpec extends SparkSpecBase {

  test("every declared query analyzes against the smoke fixture") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.assertAnalyzed(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("rows-only (no-oracle) queries are exactly the documented one") {
    // agg_sketches alone: HLL/KLL sketch internals are engine-specific by
    // design. The trained IVF/PQ family moved under the hash gate in r6
    // via seeded-exact training (integer-exact centroid updates).
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("agg_sketches"),
      s"undocumented rows-only queries: $noOracle")
  }

  test("no oracle SQL is orphaned (every oracle key has a query)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
