package graft

import graft.core.Fixtures
import graft.functions.{Distances, GraftExtensions}
import org.apache.spark.sql.functions._

/** SQL-surface registration of the vector metrics (SparkSessionExtensions
  * / FunctionRegistry): SQL-authored distance must equal the Column API. */
class ExtensionsSpec extends SparkSpecBase {

  private def qLit: String =
    Fixtures.Q64.map(d => s"CAST($d AS DOUBLE)").mkString("array(", ", ", ")")

  test("vec_sql2 via spark.sql equals Distances.squaredL2Lit") {
    GraftExtensions.install(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      s"SELECT vec_id, vec_sql2(embedding, $qLit) AS d FROM emb_sql ORDER BY vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaCol = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Distances.squaredL2Lit(col("embedding"), Fixtures.Q64).as("d"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
  }

  test("all five registered functions plan and run") {
    GraftExtensions.install(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb_sql")
    for (fn <- Seq("vec_sql2", "vec_l1", "vec_linf", "vec_dot", "vec_cosine")) {
      val n = spark.sql(
        s"SELECT $fn(embedding, $qLit) AS d FROM emb_sql WHERE vec_id < 10")
        .collect()
      assert(n.length == 10 && n.forall(!_.isNullAt(0)), fn)
    }
  }

  test("non-foldable query argument is rejected") {
    GraftExtensions.install(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb_sql")
    val ex = intercept[Exception] {
      spark.sql("SELECT vec_sql2(embedding, embedding) FROM emb_sql").collect()
    }
    assert(ex.getMessage.contains("foldable") || ex.getCause != null)
  }
}
