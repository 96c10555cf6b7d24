package graft

import graft.core.Fixtures
import graft.operators.{KnnJoin, KnnTopK}
import org.apache.spark.sql.functions._

class KnnTopKSpec extends SparkSpecBase {

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 7)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("aggregator kNN join equals window-rank kNN join exactly") {
    val viaAgg = KnnTopK.join(queries, emb, k = 5, dim = Fixtures.Dim)
      .orderBy("query_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val viaWin = KnnJoin.join(queries, emb, k = 5, dim = Fixtures.Dim)
      .orderBy("query_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(viaAgg.toSeq == viaWin.toSeq)
  }

  test("buffer stays bounded at k and merge keeps global order across partitions") {
    val out = KnnTopK.join(queries, emb.repartition(8), k = 3, dim = Fixtures.Dim)
    val perQuery = out.groupBy("query_id").count().collect()
    assert(perQuery.forall(_.getLong(1) == 3L))
    // rn follows (dist asc, id asc) within each query
    val rows = out.orderBy("query_id", "rn")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getLong(1)))
    rows.grouped(3).foreach { g =>
      assert(g.sliding(2).forall { case Array((_, d1, i1), (_, d2, i2)) =>
        d1 < d2 || (d1 == d2 && i1 < i2) })
    }
  }
}
