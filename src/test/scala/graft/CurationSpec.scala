package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("curation funnel on the fixture corpus is monotone and ends non-empty") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (curated, funnel) = Curation.curate(docs)
    val counts = funnel.map(_._2)
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a })
    assert(counts.last > 0)
    assert(curated.count() == counts.last)
    // curated output carries the quality metadata
    assert(curated.columns.contains("quality") && curated.columns.contains("lang_pred"))
  }

  test("exact replicas and near-dups collapse to one canonical document") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank again and again"
    val docs = Seq(
      (1L, base),
      (2L, base),                                    // exact dup of 1
      (3L, base.replace("bank", "shore")),           // near-dup of 1
      (4L, "completely different text about catalyst optimizer internals and query planning stages here"),
      (5L, "x")                                      // fails the quality gate
    ).toDF("doc_id", "text")
    val (curated, funnel) = Curation.curate(docs,
      Curation.Config(minQuality = 0.2, nearDupThreshold = 0.5))
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(1L) && ids.contains(4L))
    assert(!ids.contains(2L), "exact dup must collapse")
    assert(!ids.contains(3L), "near-dup must collapse into canonical 1")
    assert(!ids.contains(5L), "low-quality doc must be gated out")
    assert(funnel.head._2 == 5L)
  }
}
