package graft

import graft.pipeline.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("curation funnel on the fixture corpus is monotone and ends non-empty") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (curated, funnel) = Curation.curate(docs)
    // survivor stages are monotone; the two r14 drop-accounting rows that
    // follow are counters, not survivor counts
    val (stages, dropRows) = funnel.splitAt(4)
    val counts = stages.map(_._2)
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a })
    assert(counts.last > 0)
    assert(curated.count() == counts.last)
    // in-band LSH drop accounting: present, and zero on the healthy fixture
    // (max observed band bucket ~12 vs cap 1024)
    assert(dropRows.map(_._1) == Seq("lsh_dropped_buckets", "lsh_dropped_docs"))
    assert(dropRows.forall(_._2 == 0L))
    // curated output carries the quality metadata
    assert(curated.columns.contains("quality") && curated.columns.contains("lang_pred"))
  }

  test("drop accounting reports capped LSH buckets (non-identical pocket > cap)") {
    import graft.operators.Dedup
    // 12 docs: 8 near-identical (one trailing word varies — identical
    // shingle PREFIX keeps them in one band bucket) + 4 unrelated
    val pocket = (0 until 8).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota kappa word$i"))
    val rest = (8 until 12).map(i =>
      (i.toLong, s"totally different document number $i about unrelated subject matter entirely"))
    val docs = (pocket ++ rest).toDF("doc_id", "text")
    val (pairs, drops) = Dedup.minHashLshNearDupPairsWithDrops(
      docs, "text", "doc_id", maxBucket = 4)
    pairs.count() // materialize the pair job first (the documented order)
    val d = drops.collect()
    assert(d.nonEmpty, "the >4-doc pocket must surface in the drop report")
    assert(d.forall(_.getLong(2) > 4L))
    // every reported bucket was actually excluded from pairing: pair count
    // under the cap is <= pair count without it
    val (pairsUncapped, _) = Dedup.minHashLshNearDupPairsWithDrops(
      docs, "text", "doc_id", maxBucket = 10000)
    assert(pairs.count() <= pairsUncapped.count())
  }

  test("fused funnel head equals the per-stage counts it replaced (r16)") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // gatePassPredicate sum == qualityLangGate row count
    val gated = Curation.qualityLangGate(docs)
    val fused = docs.agg(
      sum(Curation.gatePassPredicate().cast("long")).as("n_gate"),
      countDistinct(when(Curation.gatePassPredicate(), md5(col("text"))))
        .as("n_exact")).head()
    assert(fused.getLong(0) == gated.count())
    // countDistinct(md5) over passers == exactDedup survivor count
    assert(fused.getLong(1) == Dedup.exactDedup(gated).count())
    // and the reported funnel equals a recount of each returned stage
    val (curated, funnel) = Curation.curate(docs)
    val m = funnel.toMap
    assert(m("input") == docs.count())
    assert(m("quality_lang_gate") == gated.count())
    assert(m("exact_dedup") == Dedup.exactDedup(gated).count())
    assert(m("near_dup_dedup") == curated.count())
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
