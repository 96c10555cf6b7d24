package graft

import graft.operators.{Governance, TextAnalysis}
import org.apache.spark.sql.functions._

/** Corpus-governance operators on constructed inputs where every expected
  * row is hand-checkable: per-key caps, priority-resolved dedup, and the
  * histogram-collapsed per-group percentile (which must equal SQL
  * percent_rank computed the row-level way).
  */
class GovernanceSpec extends SparkSpecBase {
  import spark.implicits._

  test("capPerKey keeps exactly n per key in the given total order") {
    val df = Seq(
      ("a", 1L, 5), ("a", 2L, 9), ("a", 3L, 9), ("a", 4L, 1),
      ("b", 5L, 2), ("b", 6L, 3),
      ("c", 7L, 8)).toDF("k", "id", "score")
    val kept = Governance.capPerKey(df, "k", 2,
        Seq(col("score").desc, col("id").asc))
      .select("k", "id").as[(String, Long)].collect().toSet
    // a: score-9 ties broken by id → ids 2, 3; b and c are under the cap
    assert(kept == Set(("a", 2L), ("a", 3L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("priorityDedup keeps the lowest (priority, id) per digest and flags the rest") {
    val df = Seq(
      (1L, "same text", 3), // loses: priority 3
      (2L, "same text", 1), // wins: priority 1
      (3L, "same text", 1), // loses: ties priority 1, larger id
      (4L, "unique", 9)     // singleton: kept
    ).toDF("doc_id", "text", "pri")
    val out = Governance.priorityDedup(df, "text", "doc_id", col("pri"))
      .select("doc_id", "group_size", "kept_id", "is_kept")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(2L) == ((2L, 3L, 2L, 1)))
    assert(out(1L) == ((1L, 3L, 2L, 0)))
    assert(out(3L) == ((3L, 3L, 2L, 0)))
    assert(out(4L) == ((4L, 1L, 4L, 1)))
  }

  test("histogram-collapsed percentile ≡ row-level percent_rank") {
    val df = Seq(
      ("en", 1L, 0.10), ("en", 2L, 0.20), ("en", 3L, 0.20), ("en", 4L, 0.90),
      ("de", 5L, 0.50), ("de", 6L, 0.60),
      ("zh", 7L, 0.30) // singleton group → pctl 0 by convention
    ).toDF("lang", "doc_id", "s")
    val got = Governance.percentileByGroup(df, "lang",
        col("s").cast("decimal(9,4)"))
      .select("doc_id", "pctl").as[(Long, Double)].collect().toMap
    // row-level reference: percent_rank over (lang ordered by s)
    val ref = df.withColumn("pr", round(percent_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("s"))), 9))
      .select("doc_id", "pr").as[(Long, Double)].collect().toMap
    assert(got == ref)
    assert(got(7L) == 0.0)
    assert(got(2L) == got(3L)) // ties share the strictly-below count
  }

  test("ngramDiversity counts total occurrences but distinct types") {
    val df = Seq(
      // "a b a b a" → trigrams: "a b a","b a b","a b a" = 3 total, 2 distinct
      (1L, "en", "a b a b a"),
      // two words → no trigram
      (2L, "en", "a b"),
      (3L, "de", "x y z") // 1 total, 1 distinct
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.ngramDiversity(df, n = 3)
      .select("lang", "n_grams", "n_distinct")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("en") == ((3L, 2L)))
    assert(out("de") == ((1L, 1L)))
  }

  test("quantileNormalize: qnorm lies in the pooled range and is monotone in pctl") {
    import org.apache.spark.sql.types.DecimalType
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val q4 = round(TextAnalysis.qualityScore(col("text")), 4).cast(DecimalType(9, 4))
    val out = Governance.quantileNormalize(docs, "source", q4)
      .select(col("score_q").cast("double"), col("pctl"), col("qnorm"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val poolMin = out.map(_._1).min; val poolMax = out.map(_._1).max
    out.foreach { case (_, _, qn) =>
      assert(qn >= poolMin - 1e-9 && qn <= poolMax + 1e-9)
    }
    // monotone: sorting by pctl must sort qnorm (ties allowed)
    val byP = out.sortBy(_._2).map(_._3)
    byP.sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9)
      case _ =>
    }
  }

  test("quantileNormalize: single group maps percentiles onto its own values (interpolation-close)") {
    import org.apache.spark.sql.types.DecimalType
    val one = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lit("only").as("source"), col("text"))
    val q4 = round(TextAnalysis.qualityScore(col("text")), 4).cast(DecimalType(9, 4))
    // with ONE group, pooled == group distribution: qnorm recovers the
    // original quantized score up to one interpolation step (adjacent
    // pooled values), since the 9-decimal pctl rounding can shift the
    // fractional rank by < 1
    val rows = Governance.quantileNormalize(one, "source", q4)
      .select(col("score_q").cast("double"), col("qnorm")).collect()
    val distinct = rows.map(_.getDouble(0)).distinct.sorted
    val maxGap = distinct.sliding(2).collect { case Array(a, b) => b - a }
      .foldLeft(0.0)(math.max)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(0)) <= maxGap + 1e-9)
    }
  }

  test("quantileNormalize: degenerate hot bucket — chunked rank explode is value-identical and per-task bounded") {
    import org.apache.spark.sql.types.DecimalType
    // 90% of the corpus lands on ONE quantized score (the "millions of
    // docs all at quality 0" hazard): the rank explode must never build a
    // bucket-sized array. rankChunk = 16 forces the hot bucket through
    // ⌈900/16⌉ = 57 chunks; the default path at this size is one array.
    val docs = ((0 until 900).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", "x")) ++
      (0 until 100).map(i => (900L + i, "a", ("y " * (i % 10 + 2)).trim))
      ).toDF("doc_id", "source", "text")
    val q4 = round(TextAnalysis.qualityScore(col("text")), 4).cast(DecimalType(9, 4))
    def key(rc: Long) = Governance.quantileNormalize(docs, "source", q4, rankChunk = rc)
      .select(col("doc_id"), col("qnorm")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    // chunk width must not change a single value: 16-wide chunks and the
    // 1-wide extreme (every rank its own array) both equal the default
    assert(key(16L) == key(Governance.QnormRankChunk))
    assert(key(1L) == key(Governance.QnormRankChunk))
  }

  test("epochUpsample replicates ⌊rate⌋ or ⌈rate⌉ times and converges to rate·n") {
    import org.apache.spark.sql.functions.{col, lit}
    val n = 1000
    val df = (0 until n).map(i => (i.toLong, 2.5)).toDF("id", "rate")
    val out = Governance.epochUpsample(df, col("id"), col("rate"))
    val perId = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perId.size == n)
    assert(perId.values.forall(c => c == 2L || c == 3L))
    val total = perId.values.sum
    // hash-selected half gets the 3rd copy: expect ~2500 ± a few percent
    assert(math.abs(total - 2500L) < 120, s"total copies $total")
    // copy_idx is dense 1..n_copies per id
    val idx = out.filter(col("id") === 0L).select("copy_idx")
      .collect().map(_.getInt(0)).sorted
    assert(idx.toSeq == (1 to perId(0L).toInt))
    // integer rate replicates exactly
    val exact2 = Governance.epochUpsample(
      (0 until 50).map(i => (i.toLong, 2.0)).toDF("id", "rate"),
      col("id"), col("rate")).count()
    assert(exact2 == 100L)
  }

  test("epochUpsample rate < 1 downsamples deterministically (one copy or none)") {
    import org.apache.spark.sql.functions.col
    val df = (0 until 1000).map(i => (i.toLong, 0.30)).toDF("id", "rate")
    val out = Governance.epochUpsample(df, col("id"), col("rate"))
    assert(out.groupBy("id").count().collect().forall(_.getLong(1) == 1L))
    val n = out.count()
    assert(math.abs(n - 300L) < 60, s"kept $n of 1000 at rate 0.30")
    // replay-stable
    assert(out.count() == n)
  }

  test("epochUpsample is deterministic and map-side (no shuffle in the plan)") {
    import org.apache.spark.sql.functions.col
    val df = (0 until 100).map(i => (i.toLong, 1.25)).toDF("id", "rate")
    val a = Governance.epochUpsample(df, col("id"), col("rate"))
    assert(a.collect().toSeq == Governance.epochUpsample(df, col("id"), col("rate")).collect().toSeq)
    val nEx = a.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size
    assert(nEx == 0, "epochUpsample must not shuffle")
  }

  test("k-anonymity report and violations agree with a hand-counted table") {
    // groups: (de,A)x5  (de,B)x2  (fr,A)x1  -> k=3 violates on 2 groups, 3 rows
    val rows = Seq.fill(5)(("de", "A")) ++ Seq.fill(2)(("de", "B")) ++ Seq(("fr", "A"))
    val df = rows.zipWithIndex.map { case ((c1, c2), i) => (i.toLong, c1, c2) }
      .toDF("id", "country", "segment")
    val rep = Governance.kAnonymityReport(df, Seq("country", "segment"), k = 3L).head()
    assert(rep.getLong(0) == 3L && rep.getLong(1) == 3L)
    assert(rep.getLong(2) == 2L, "two violating groups")
    assert(rep.getLong(3) == 3L, "three rows at risk")
    assert(rep.getLong(4) == 1L && rep.getInt(5) == 0)
    val viol = Governance.kAnonymityViolations(df, Seq("country", "segment"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viol == Set(("de", "B", 2L), ("fr", "A", 1L)))
    // raising every group to k flips the flag
    val ok = Governance.kAnonymityReport(df, Seq("country"), k = 1L).head()
    assert(ok.getInt(5) == 1)
  }

  test("kSuppress releases a k-anonymous table; lDiversity counts sensitive leakage") {
    val rows = Seq.fill(5)(("de", "A")) ++ Seq.fill(2)(("de", "B")) ++ Seq(("fr", "A"))
    val df = rows.zipWithIndex.map { case ((c1, c2), i) => (i.toLong, c1, c2) }
      .toDF("id", "country", "segment")
    val released = Governance.kSuppress(df, Seq("country", "segment"), k = 3L)
    assert(released.count() == 5L, "only the (de,A) group survives")
    val re = Governance.kAnonymityReport(released, Seq("country", "segment"), k = 3L).head()
    assert(re.getInt(5) == 1 && re.getLong(3) == 0L,
      "released table must be k-anonymous by construction")
    // l-diversity: group (de) has segments {A,B} (l=2); (fr) only {A} (l=1)
    val ld = Governance.lDiversityReport(df, Seq("country"), "segment", l = 2L).head()
    assert(ld.getLong(0) == 2L && ld.getLong(1) == 2L)
    assert(ld.getLong(2) == 1L && ld.getLong(3) == 1L, "fr leaks its only segment")
    assert(ld.getLong(4) == 1L && ld.getInt(5) == 0)
  }

  test("lDiversityApproxAudit: exact summary, sketch flag, NULL quasi groups pair up") {
    // small domains: HLL++ is exact well below its sparse threshold, so
    // the flag must be 1 and the summary must equal the exact report —
    // including a NULL quasi group (the null-safe group join)
    val rows: Seq[(Long, String, String)] =
      Seq((0L, "de", "s1"), (1L, "de", "s2"), (2L, "de", "s3"),
        (3L, "fr", "s1"), (4L, "fr", "s1"),
        (5L, null, "s1"), (6L, null, "s2"))
    val df = rows.toDF("id", "country", "segment")
    val got = Governance.lDiversityApproxAudit(df, Seq("country"), "segment", l = 2L)
      .head()
    val exact = Governance.lDiversityReport(df, Seq("country"), "segment", l = 2L)
      .head()
    assert((0 until 6).forall(i => got.get(i) == exact.get(i)),
      s"approx audit summary must equal the exact report: $got vs $exact")
    assert(got.getLong(1) == 3L, "NULL-country group must be counted")
    assert(got.getInt(6) == 1, "sketches exact at this cardinality -> flag 1")
  }

  test("kSuppress suppresses under-k NULL-quasi groups (null-safe anti-join)") {
    // r14 ADVICE: kAnonymityReport's groupBy counts NULL as a group of
    // its own, so the enforcement anti-join must match NULLs too — a
    // plain-equality join would release the two (NULL, A) rows below.
    val rows: Seq[(Long, String, String)] =
      Seq.fill(5)(("de", "A")).zipWithIndex.map { case ((c1, c2), i) => (i.toLong, c1, c2) } ++
        Seq((5L, null, "A"), (6L, null, "A"), (7L, "fr", null))
    val df = rows.toDF("id", "country", "segment")
    val released = Governance.kSuppress(df, Seq("country", "segment"), k = 3L)
    assert(released.count() == 5L,
      "both the (NULL,A) x2 and (fr,NULL) x1 under-k groups must be suppressed")
    val re = Governance.kAnonymityReport(released, Seq("country", "segment"), k = 3L).head()
    assert(re.getInt(5) == 1 && re.getLong(3) == 0L,
      "re-audit must be anonymous even with NULL quasi values in the input")
  }
}
