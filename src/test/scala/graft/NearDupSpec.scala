package graft

import graft.core.Fixtures
import graft.operators.{Ann, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** New near-dup / fingerprint operators: banded vector LSH, full
  * MinHash-LSH pipeline, winnowing fingerprints. */
class NearDupSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river shore"), // near-dup of 1
    (3L, "completely different words about spark catalyst optimizer internals"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank")   // exact dup of 1
  ).toDF("doc_id", "text")

  test("minhash-lsh pipeline: exact dup always pairs; near-dup found; unrelated not") {
    val pairs = Dedup.minHashLshNearDupPairs(docs, "text", "doc_id",
        shingleWidth = 3, numHashes = 8, bands = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))      // identical docs: all bands collide, jac = 1
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dups share most shingles
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash-lsh: prefilter (scale) path and small-corpus path return identical pairs") {
    def run(hint: Long) =
      Dedup.minHashLshNearDupPairs(docs, "text", "doc_id",
          shingleWidth = 3, numHashes = 8, bands = 4, threshold = 0.5,
          docCountHint = hint)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // hint below the threshold → small path; hint above → the left-semi
    // candidate-prefilter path; the cost-based choice must never change
    // the answer
    assert(run(4L) == run(Dedup.PrefilterMinDocs * 2))
    assert(run(4L).contains((1L, 4L)))
  }

  test("winnowing: identical docs share all fingerprints; overlap detected; local to content") {
    val fps = TextAnalysis.winnowFingerprints(docs, k = 4, win = 5)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L) == fps(4L))
    assert((fps(1L) & fps(2L)).nonEmpty)        // shared prefix run -> shared fingerprint
    assert((fps(1L) & fps(3L)).isEmpty)
  }

  test("winnowing: short doc (fewer shingles than window) still fingerprints") {
    val short = Seq((9L, "just five words right here")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(short, k = 4, win = 5).collect()
    assert(fps.length >= 1)
  }

  test("banded LSH: identical vectors collide in every band; verified pairs meet threshold") {
    val v = Array.fill(Fixtures.Dim)(0.3f)
    val w = Array.tabulate(Fixtures.Dim)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val db = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val pairs = Ann.lshBandedNearDupPairs(db, Fixtures.Planes16, Fixtures.Dim,
        bandBits = 4, minCosine = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("nearDupPipeline: exact replicas collapse first, only true near-dups pair") {
    val corpus = docs.unionByName(
      docs.filter($"doc_id" === 1L).withColumn("doc_id", lit(100L))) // replica of 1
    val pairs = Dedup.nearDupPipeline(corpus, "text", "doc_id",
        shingleWidth = 3, numHashes = 8, bands = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // replicas (1,100) and (1,4) were removed by exact dedup, so no pair
    // touches 100 or 4; the genuine near-dup pair (1,2) survives
    assert(!pairs.exists(p => p._1 == 100L || p._2 == 100L || p._1 == 4L || p._2 == 4L))
    assert(pairs.contains((1L, 2L)))
  }

  test("fingerprintEdges: df cap drops the hot boilerplate bucket, keeps real pairs") {
    // one deliberately hot fingerprint (50 docs — quadratic hazard) plus a
    // genuine 2-doc duplicate bucket
    val fps = ((1L to 50L).map(i => (i, 999L)) ++ Seq((60L, 7L), (61L, 7L)))
      .toDF("doc_id", "fp")
    val edges = Dedup.fingerprintEdges(fps, "doc_id", "fp", maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    assert(edges == Set((60L, 61L))) // hot bucket contributes zero candidates
    val audit = Dedup.hotBucketAudit(fps, "doc_id", "fp", maxBucket = 10)
      .as[(Long, Long)].collect().toSeq
    assert(audit == Seq((999L, 50L)))
    // the uncapped join would have paid the full |bucket|² on the hot key
    assert(Dedup.fingerprintEdges(fps, "doc_id", "fp", maxBucket = 1000).count()
      == 50L * 49 / 2 + 1)
  }

  test("minhash-lsh band cap: hot near-identical pocket is dropped and audited, real pairs kept") {
    // 30 byte-identical texts (one LSH clique — every band bucket holds all
    // 30) plus a genuine 2-doc near-dup pair in a different dialect. With
    // the cap below 30 the clique contributes ZERO candidates, bounding
    // the band join's volume; the audit lists exactly the dropped buckets.
    val hot = (1L to 30L).map(i => (i, "the same boilerplate template text repeated verbatim"))
    val near = Seq((100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "alpha beta gamma delta epsilon eta"))
    val docs = (hot ++ near).toDF("doc_id", "text")
    val capped = Dedup.minHashLshNearDupPairs(docs, "text", "doc_id",
        threshold = 0.4, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)))
    val audit = Dedup.lshHotBandAudit(docs, maxBucket = 10)
      .as[(Int, String, Long)].collect()
    assert(audit.length == 4 && audit.forall(_._3 == 30L)) // all 4 bands hot
    // uncapped: the clique pays its full C(30,2) pair volume
    val uncapped = Dedup.minHashLshNearDupPairs(docs, "text", "doc_id", threshold = 0.4)
    assert(uncapped.count() == 30L * 29 / 2 + 1)
    // a cap ABOVE the clique size leaves the output untouched — the cap
    // only ever bites past its threshold
    assert(Dedup.minHashLshNearDupPairs(docs, "text", "doc_id", threshold = 0.4,
      maxBucket = 31).count() == 30L * 29 / 2 + 1)
  }

  test("connected components on an empty edge list returns an empty result") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("connected components: chain, star, and singleton-pair merge to min-id canonical (both paths)") {
    // chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L))
      .toDF("id_a", "id_b")
    // default = driver union-find; driverThreshold = 0 forces the
    // distributed min-label loop — contract must be identical
    for (threshold <- Seq(500000L, 0L)) {
      val cc = Dedup.connectedComponents(edges, driverThreshold = threshold)
        .as[(Long, Long)].collect().toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L), s"threshold=$threshold")
      assert(Seq(10L, 11L, 12L, 13L).forall(cc(_) == 10L), s"threshold=$threshold")
      assert(Seq(20L, 21L).forall(cc(_) == 20L), s"threshold=$threshold")
    }
  }

  test("connected components: driver union-find equals distributed loop on a random graph") {
    val rnd = new scala.util.Random(17)
    val n = 200
    val edges = (1 to 300).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
    }.filter(e => e._1 != e._2).toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val viaLoop = Dedup.connectedComponents(edges, driverThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaLoop)
  }

  test("embedding LSH band cap: identical-vector clique past the cap stops pairing, small buckets unaffected") {
    val v = Array.fill(Fixtures.Dim)(0.5f)
    val u = Array.fill(Fixtures.Dim)(-0.5f)
    // 30 byte-identical embeddings collide in every band (one |bucket|²
    // clique); a separate 2-vector duplicate pocket must keep pairing
    val db = ((1L to 30L).map(i => (i, v)) ++ Seq((100L, u), (101L, u)))
      .toDF("vec_id", "embedding")
    val capped = Ann.lshBandedNearDupPairs(db, Fixtures.Planes16, Fixtures.Dim,
        bandBits = 4, minCosine = 0.5, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)))
    // default cap far above the clique: full C(30,2) + the pocket pair
    assert(Ann.lshBandedNearDupPairs(db, Fixtures.Planes16, Fixtures.Dim,
      4, 0.5).count() == 30L * 29 / 2 + 1)
  }

  test("random corpora: cap above max bucket == uncapped; capped pairs ⊆ uncapped (4 trials)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    for (_ <- 1 to 4) {
      // ~60 docs over a tiny vocab with deliberate replication — collisions
      // and mid-size buckets guaranteed, bucket sizes vary per trial
      val base = (0 until 20).map { i =>
        (0 until (4 + rnd.nextInt(6))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val docsSeq = (0 until 60).map(i => (i.toLong, base(rnd.nextInt(base.size))))
      val docs = docsSeq.toDF("doc_id", "text")
      def pairs(cap: Int) = Dedup.minHashLshNearDupPairs(docs, "text", "doc_id",
          threshold = 0.3, maxBucket = cap)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val un = pairs(1000000)
      // a cap above any possible bucket (60 docs) must change nothing
      assert(pairs(60) == un)
      // a biting cap may only REMOVE pairs, never invent them
      assert(pairs(3).subsetOf(un))
    }
  }

  test("banded LSH pairs are deduped across bands (no duplicate pair rows)") {
    val v = Array.fill(Fixtures.Dim)(0.5f)
    val db = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
    val rows = Ann.lshBandedNearDupPairs(db, Fixtures.Planes16, Fixtures.Dim, 4, 0.5).collect()
    assert(rows.length == 1)
  }
}
