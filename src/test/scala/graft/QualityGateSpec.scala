package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.operators.{Governance, LangModel, TextAnalysis}

/** The round-10 curation-gate additions: Gopher-style rule flags
  * (map-side, integer-exact), CCNet-style perplexity buckets (exact
  * decimal threshold compare), and the deterministic sharded epoch
  * shuffle (seed-keyed permutation through a PARTITIONED window).
  */
class QualityGateSpec extends SparkSpecBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("gopherRules flags match a per-row scala recomputation; keep is the conjunction") {
    val got = TextAnalysis.gopherRules(docs).collect()
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val text = texts(r.getLong(0))
      val ws = text.split(" ", -1)
      val nw = ws.length
      val chars = text.length - nw + 1
      val nstop = ws.count(graft.core.Fixtures.Stopwords.contains)
      val ndist = ws.distinct.length
      assert(r.getInt(1) == nw && r.getInt(2) == nstop && r.getInt(3) == ndist)
      val (rwc, rmwl) = (nw >= 20 && nw <= 80, chars >= nw * 3 && chars <= nw * 8)
      val (rstop, rdist) = (nstop * 50 >= nw, ndist * 2 >= nw)
      assert(r.getBoolean(4) == rwc && r.getBoolean(5) == rmwl)
      assert(r.getBoolean(6) == rstop && r.getBoolean(7) == rdist)
      assert(r.getBoolean(8) == (rwc && rmwl && rstop && rdist))
    }
    // rules must discriminate on the fixture (a rule that never fires
    // tests nothing) — each flag sees both values somewhere
    Seq(4, 6, 7).foreach { i =>
      assert(got.map(_.getBoolean(i)).distinct.length == 2, s"rule col $i constant")
    }
  }

  test("gopherRules is one map-side projection: zero shuffles in the plan") {
    val p = TextAnalysis.gopherRules(docs).queryExecution.executedPlan
    assert(p.collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }

  test("gopherRepetitionRules match a per-row scala recomputation; zero shuffles") {
    val got = TextAnalysis.gopherRepetitionRules(docs).collect()
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val ws = texts(r.getLong(0)).split(" ", -1)
      val nw = ws.length
      val ndup = nw - ws.distinct.length
      val max2 = if (nw >= 2)
        ws.sliding(2).map(_.mkString(" ")).toSeq.groupBy(identity).values.map(_.size).max.toLong
      else 0L
      assert(r.getInt(1) == nw && r.getInt(2) == ndup && r.getLong(3) == max2,
        s"doc ${r.getLong(0)}")
      val (rd, rt) = (ndup * 10 <= nw * 3, max2 * 5 <= nw - 1)
      assert(r.getBoolean(4) == rd && r.getBoolean(5) == rt && r.getBoolean(6) == (rd && rt))
    }
    val p = TextAnalysis.gopherRepetitionRules(docs).queryExecution.executedPlan
    assert(p.collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }

  test("perplexityBuckets agrees with the exact-decimal recomputation from scoreSums") {
    val train = docs.filter(col("doc_id") % 10 === 0)
    val held = docs.filter(col("doc_id") % 10 =!= 0)
    val buckets = LangModel.perplexityBuckets(train, held).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val sums = LangModel.scoreSums(train, held).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap
    assert(buckets.nonEmpty && buckets.length == sums.size)
    val (tTail, tHead) = (BigDecimal("-3.55"), BigDecimal("-3.49"))
    buckets.foreach { case (id, n, b) =>
      val (nb, sum) = sums(id)
      assert(n == nb)
      val expect =
        if (sum < tTail * nb) "tail"
        else if (sum >= tHead * nb) "head"
        else "middle"
      assert(b == expect, s"doc $id: sum=$sum n=$nb got=$b want=$expect")
    }
    // thresholds must split the fixture corpus into 2+ non-empty buckets
    assert(buckets.map(_._3).distinct.length >= 2)
  }

  test("epochShuffle is a bijection onto (shard, 1..shardSize), stable across runs, seed-sensitive") {
    val ids = docs.select(col("doc_id"))
    val a = Governance.epochShuffle(ids, col("doc_id"), seed = 7, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val n = ids.count()
    assert(a.length == n)
    // bijection: (shard, pos) keys are distinct, positions are 1..size(shard)
    assert(a.map(t => (t._2, t._3)).distinct.length == n)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // deterministic replay
    val b = Governance.epochShuffle(ids, col("doc_id"), seed = 7, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
    // a different seed is a different permutation
    val c = Governance.epochShuffle(ids, col("doc_id"), seed = 8, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sortBy(_._1).toSeq != c.sortBy(_._1).toSeq)
  }

  test("shardCountFor: ceil(n/target), fixture-stable at 8, scales with the corpus") {
    assert(Governance.shardCountFor(0) == 1)
    assert(Governance.shardCountFor(1) == 1)
    assert(Governance.shardCountFor(64) == 1)
    assert(Governance.shardCountFor(65) == 2)
    assert(Governance.shardCountFor(500) == 8)   // the sf0.01 fixture → historical 8 shards
    assert(Governance.shardCountFor(1000000000L) == 15625000) // 10^9 rows: 64-row shards, no cliff
    assert(Governance.shardCountFor(100, targetShardSize = 10) == 10)
    // bijection holds at a count-derived, non-power-of-two shard count too
    val ids = docs.select(col("doc_id"))
    val n = ids.count()
    val out = Governance.epochShuffle(ids, col("doc_id"), seed = 7,
        nShards = Governance.shardCountFor(n, targetShardSize = 7))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length == n)
    assert(out.map(t => (t._2, t._3)).distinct.length == n)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
  }

  test("shardManifest: covers the corpus exactly, digests are order-sensitive and seed-sensitive") {
    val ids = docs.select(col("doc_id"), lit(3L).as("n_tok"))
    val n = ids.count()
    def manifest(seed: Int) = Governance.shardManifest(
      Governance.epochShuffle(ids, col("doc_id"), seed = seed, nShards = 8),
      col("doc_id"), col("n_tok"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val m7 = manifest(7)
    assert(m7.map(_._2).sum == n)          // every doc in exactly one shard
    assert(m7.map(_._3).sum == 3L * n)     // token mass conserved
    assert(m7.map(_._4).distinct.length == m7.length) // shards have distinct content
    // deterministic replay; a different seed re-permutes → different digests
    assert(manifest(7).toSeq == m7.toSeq)
    val m8 = manifest(8)
    assert(m7.map(_._4).toSet != m8.map(_._4).toSet)
    // order sensitivity: the digest hashes ids in POSITION order, so two
    // shards with the same id SET but different order must differ — build
    // one directly
    import spark.implicits._
    val a = Seq((0, 1, 10L, 1L), (0, 2, 20L, 1L)).toDF("shard", "pos", "doc_id", "n_tok")
    val b = Seq((0, 1, 20L, 1L), (0, 2, 10L, 1L)).toDF("shard", "pos", "doc_id", "n_tok")
    val da = Governance.shardManifest(a, col("doc_id"), col("n_tok")).collect()(0).getString(3)
    val db = Governance.shardManifest(b, col("doc_id"), col("n_tok")).collect()(0).getString(3)
    assert(da != db)
  }

  test("pipeline_pretrain_v2 composes the gates: survivors are gopher-kept, non-tail, digest-unique, shuffle-complete") {
    val out = SparkEntry.queries("pipeline_pretrain_v2")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // every survivor passes the gopher gate and is a held-out (non-train) doc
    val gateIds = docs.filter(col("doc_id") % 10 =!= 0)
      .filter(TextAnalysis.gopherKeep(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = out.map(_.getLong(0))
    assert(ids.forall(gateIds.contains) && ids.distinct.length == ids.length)
    // no 'tail' bucket survives; at least one doc was actually filtered somewhere
    assert(out.forall(_.getString(1) != "tail"))
    assert(ids.length < gateIds.size || gateIds.size < docs.count())
    // the epoch-shuffle output is a bijection onto (shard, 1..shardSize)
    val sp = out.map(r => (r.getInt(3), r.getInt(4)))
    assert(sp.distinct.length == sp.length)
    sp.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
  }

  test("epochShuffle windows are partitioned by shard — never a single-partition global sort") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Governance.epochShuffle(docs.select(col("doc_id")),
        col("doc_id"), seed = 7, nShards = 8).queryExecution.executedPlan
      val windows = plan.collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.nonEmpty)
      windows.foreach(w => assert(w.partitionSpec.nonEmpty))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
