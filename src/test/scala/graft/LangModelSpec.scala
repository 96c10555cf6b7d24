package graft

import graft.operators.LangModel

class LangModelSpec extends SparkSpecBase {
  import spark.implicits._

  test("bigrams: consecutive pairs, in-document order, none across docs") {
    val docs = Seq((1L, "a b c d"), (2L, "x y"), (3L, "solo")).toDF("doc_id", "text")
    val got = LangModel.bigrams(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "a", "b"), (1L, "b", "c"), (1L, "c", "d"), (2L, "x", "y")))
  }

  test("scoreHeldOut matches hand-computed add-one smoothing") {
    // train bigrams: doc1 "a b a b" -> (a,b),(b,a),(a,b); doc2 "a b c" ->
    // (a,b),(b,c). c12: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2; V={a,b,c}=3
    val train = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val held = Seq((10L, "a b z")).toDF("doc_id", "text")
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // (a,b): ln((3+1)/(3+3)); (b,z) unseen: ln((0+1)/(2+3))
    val expect = (r6(math.log(4.0 / 6.0)) + r6(math.log(1.0 / 5.0))) / 2
    val rows = LangModel.scoreHeldOut(train, held).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 2L)
    assert(math.abs(rows.head.getDouble(2) - expect) < 2e-6)
  }

  test("single-word held-out docs produce no bigrams and drop out cleanly") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text")
    val held = Seq((10L, "solo"), (11L, "a b")).toDF("doc_id", "text")
    val ids = LangModel.scoreHeldOut(train, held).collect().map(_.getLong(0)).toSet
    assert(ids == Set(11L))
  }

  test("dsirLogRatios: target-like raw docs outrank raw-like ones; ratio is the exact sum difference") {
    import org.apache.spark.sql.functions._
    // target slice speaks "alpha beta gamma"; most raw docs speak
    // "delta epsilon zeta"; two raw docs speak the target dialect and
    // must carry the highest importance ratios
    val target = (0 until 6).map(i => (100L + i, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val raw = ((0 until 8).map(i => (i.toLong, "delta epsilon zeta delta epsilon")) ++
      Seq((50L, "alpha beta gamma alpha"), (51L, "beta gamma alpha beta"))).toDF("doc_id", "text")
    val got = LangModel.dsirLogRatios(target, raw).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val topTwo = got.toSeq.sortBy(-_._2).take(2).map(_._1).toSet
    assert(topTwo == Set(50L, 51L), s"ratios: $got")
    // every raw-dialect doc scores strictly below both target-dialect docs
    val floor = math.min(got(50L), got(51L))
    (0 until 8).foreach(i => assert(got(i.toLong) < floor, s"doc $i: ${got(i.toLong)}"))
    // exactness: the ratio equals scoreSums(target) - scoreSums(raw) re-derived
    val st = LangModel.scoreSums(target, raw).collect()
      .map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    val sr = LangModel.scoreSums(raw, raw).collect()
      .map(r => r.getLong(0) -> r.getDecimal(2)).toMap
    got.foreach { case (id, lr) =>
      assert(lr == st(id).subtract(sr(id)).doubleValue(), s"doc $id")
    }
  }

  test("over-cap model: distributed fallback is value-identical to the broadcast path") {
    val train = Seq((1L, "a b a b c"), (2L, "a b c d"), (3L, "b c d e")).toDF("doc_id", "text")
    val held = Seq((10L, "a b z"), (11L, "c d e a"), (12L, "q r")).toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).sortBy(_._1).toSeq
    // maxModelRows = 1 forces every model table over the cap → shuffle joins
    assert(key(LangModel.scoreSums(train, held, maxModelRows = 1L)) ==
      key(LangModel.scoreSums(train, held)))
    def dsir(cap: Long) = LangModel.dsirLogRatios(train, held, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(dsir(1L) == dsir(LangModel.MaxModelRows))
    def buckets(cap: Long) = LangModel.perplexityBuckets(train, held, maxModelRows = cap)
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1).toSeq
    assert(buckets(1L) == buckets(LangModel.MaxModelRows))
  }

  test("over-cap model plans with no broadcast hash join on the model tables") {
    val train = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val held = Seq((10L, "a b c d")).toDF("doc_id", "text")
    def planOf(cap: Long) = {
      val df = LangModel.scoreSums(train, held, maxModelRows = cap)
      df.collect() // materialize so AQE finalizes the join strategies
      df.queryExecution.executedPlan.toString
    }
    // With size-based broadcasting off, only the explicit hint can yield a
    // BroadcastHashJoin — so its absence proves the over-cap path dropped
    // the hint (in production AQE may still re-broadcast a measured-small
    // side, which is safe: it never broadcasts an over-threshold table).
    // The vocab scalar rides a BroadcastNestedLoopJoin either way.
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      assert(!planOf(1L).contains("BroadcastHashJoin"))
      assert(planOf(LangModel.MaxModelRows).contains("BroadcastHashJoin"))
    } finally {
      prev.foreach(spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
      prevA.foreach(spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
      if (prev.isEmpty) spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      if (prevA.isEmpty) spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("unseen-everything document scores ln(1/V) per bigram") {
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val held = Seq((10L, "p q r")).toDF("doc_id", "text")
    // every bigram: ln((0+1)/(0+3))
    val expect = math.round(math.log(1.0 / 3.0) * 1e6) / 1e6
    val row = LangModel.scoreHeldOut(train, held).collect().head
    assert(row.getLong(1) == 2L)
    assert(math.abs(row.getDouble(2) - expect) < 2e-6)
  }
}
