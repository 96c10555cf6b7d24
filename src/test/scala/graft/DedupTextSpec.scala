package graft

import graft.core.Tables
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir).cache()

  test("exact dedup: duplicated text collapses to one row, min id kept") {
    val dup = docs.limit(2)
      .unionByName(docs.limit(2).withColumn("doc_id", col("doc_id") + 1000000L))
    val out = Dedup.exactDedup(dup)
    assert(out.count() === 2)
    assert(out.agg(max("doc_id")).collect()(0).getLong(0) < 1000000L)
  }

  test("shingles: n words -> n-w+1 distinct shingles (no dup words)") {
    val df = Seq("a b c d e").toDF("text")
    val sh = df.select(Dedup.shingles(col("text"), 3).as("s")).collect()(0).getSeq[String](0)
    assert(sh.toSet === Set("a b c", "b c d", "c d e"))
    val short = Seq("a b").toDF("text")
      .select(Dedup.shingles(col("text"), 3).as("s")).collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("minhash: identical docs get identical signatures; signature within hash range") {
    val two = docs.limit(1)
      .unionByName(docs.limit(1).withColumn("doc_id", col("doc_id") + 7L))
    val sig = Dedup.minHashSignature(two, "text", "doc_id", 3, 8).collect()
    assert(sig.length === 2)
    val a = (1 to 8).map(i => sig(0).getLong(i))
    val b = (1 to 8).map(i => sig(1).getLong(i))
    assert(a === b)
    assert(a.forall(v => v >= 0 && v < Dedup.MinHashP))
  }

  test("MinHashSigExpr: independently built identical expressions are value-equal and semanticEquals") {
    // coefficients ride as Seq (value equality) — with Array fields a
    // catalyst case class compares by reference and two structurally
    // identical kernels would never canonicalize together (no
    // subexpression elimination across them)
    import org.apache.spark.sql.catalyst.expressions.Literal
    def expr() = {
      val c = Dedup.minHashCoeffs(4) // fresh arrays each call
      graft.functions.MinHashSigExpr(Literal("a b c d"), 3,
        c.map(_._1), c.map(_._2), Dedup.MinHashP)
    }
    assert(expr() == expr())
    assert(expr().semanticEquals(expr()))
  }

  test("fused minhash kernel == explode+groupBy reference on random docs (incl. unicode/edge cases)") {
    // The r10 kernel (MinHashSigExpr) must be BIT-identical to the
    // original shingle-explode → md5Int32 → pmod-min formulation it
    // replaced — same split semantics (trailing empties, repeated
    // spaces), same md5-first-8-hex hash, same mod arithmetic.
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "γάμμα", "δ", "e", "", "naïve", "🙂x", "longertoken")
    val texts = (0 until 40).map { i =>
      val n = rnd.nextInt(12)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ "" :+ "one two" :+ "a a a a a" :+ "x  y   z w"
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fused = Dedup.minHashSignature(df, "text", "doc_id", 3, 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    // reference: the pre-r10 DataFrame formulation, inlined
    val sh = df.select(col("doc_id"),
        explode(Dedup.shingles(col("text"), 3)).as("shingle"))
      .withColumn("h", Dedup.md5Int32(col("shingle")))
    val aggs = Dedup.minHashCoeffs(8).zipWithIndex.map { case ((a, b), j) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(Dedup.MinHashP))).as(s"mh_$j")
    }
    val ref = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail.toSeq: _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(fused.keySet === ref.keySet,
      s"row sets differ: fused-only ${fused.keySet -- ref.keySet}, ref-only ${ref.keySet -- fused.keySet}")
    ref.foreach { case (id, sig) =>
      assert(fused(id) === sig, s"signature mismatch for doc $id")
    }
  }

  test("lsh: identical docs are candidate pairs") {
    val two = docs.limit(1)
      .unionByName(docs.limit(1).withColumn("doc_id", col("doc_id") + 7L))
    val sig = Dedup.minHashSignature(two, "text", "doc_id", 3, 8)
    val pairs = Dedup.lshCandidatePairs(sig, "doc_id", 8, 4).collect()
    assert(pairs.length === 1)
  }

  test("simhash: identical docs identical sigs; hamming 0; different docs differ") {
    val sub = docs.limit(3)
    val sig = Dedup.simHash(sub.unionByName(sub.withColumn("doc_id", col("doc_id") + 100L)),
      "text", "doc_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) === sig(100L))
    assert(sig(1L) === sig(101L))
  }

  test("jaccard: identical sets -> 1.0; disjoint -> 0.0") {
    val df = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).collect().map(_.getDouble(0))
    assert(j(0) === 1.0 && j(1) === 0.0)
  }

  test("repetition signals: exact fractions on constructed docs") {
    val df = Seq(
      (1L, "a a a a"),   // dup 3/4; bigram "a a"×3 of 3 slots → 1.0
      (2L, "a b c d"),   // dup 0; all bigrams distinct → 1/3
      (3L, "x"),         // one word: no bigrams → 0.0
      (4L, "a b a b a")  // dup 3/5; "a b"×2 of 4 slots → 0.5
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getDouble(2), x.getDouble(3)))
    assert(r(0) === ((1L, 4, 0.75, 1.0)))
    assert(r(1) === ((2L, 4, 0.0, 1.0 / 3.0)))
    assert(r(2) === ((3L, 1, 0.0, 0.0)))
    assert(r(3) === ((4L, 5, 0.6, 0.5)))
  }

  test("text features: counts are consistent") {
    val f = TextAnalysis.docFeatures(docs).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val nWords = r.getInt(r.fieldIndex("n_words"))
      val nStop = r.getInt(r.fieldIndex("n_stopwords"))
      assert(nWords > 0 && nStop >= 0 && nStop <= nWords)
    }
  }

  test("repeated n-gram spans: overlapping and touching gram intervals merge; within-doc repeats don't count") {
    val d = Seq(
      (0L, "p q r s t u v"),      // grams at 0,1 shared with doc 1 -> [0,6)
      (1L, "z z p q r s t u z"),  // grams at 2,3 shared with doc 0 -> [2,8)
      (2L, "m m m m m m"),        // within-doc repeat only: df=1, no span
      (3L, "x y"),                // shorter than n: no grams
      (4L, "a b c d e f g h i j"),// spans [0,5)+[5,10) touch -> merged [0,10)
      (5L, "a b c d e"),
      (6L, "f g h i j")).toDF("doc_id", "text")
    val got = Dedup.repeatedNgramSpans(d, n = 5)
      .orderBy(col("doc_id"), col("span_start"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 0L, 6L, 2L),
      (1L, 2L, 8L, 2L),
      (4L, 0L, 10L, 2L),
      (5L, 0L, 5L, 1L),
      (6L, 0L, 5L, 1L)))
  }

  test("exact-gram spans equal the hashed spans when hashes don't collide, and catch forced collisions") {
    val d = Seq(
      (0L, "p q r s t u v"),
      (1L, "z z p q r s t u z"),
      (2L, "m m m m m m"),
      (4L, "a b c d e f g h i j"),
      (5L, "a b c d e"),
      (6L, "f g h i j")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id"), col("span_start"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // on collision-free input the two variants agree exactly
    assert(rows(Dedup.repeatedNgramSpansExact(d, n = 5)) === rows(Dedup.repeatedNgramSpans(d, n = 5)))
    // and on the fixture corpus as well (md5-60-bit collisions at fixture
    // scale would need ~2^30 grams; the equality is the collision audit)
    assert(rows(Dedup.repeatedNgramSpansExact(docs, n = 5)) === rows(Dedup.repeatedNgramSpans(docs, n = 5)))
  }

  test("incremental dedup: batch docs classify as exact/near/keep against the corpus only") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (1L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val batch = Seq(
      (107L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"), // exact copy of 0
      (117L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau CHANGED"), // near-dup of 0
      (127L, "totally novel words that appear nowhere else in any corpus document at all today")).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (107L, "exact", 0L),
      (117L, "near", 0L),
      (127L, "keep", -1L)))
  }

  test("one prebuilt dedup index serves successive batches == one-shot per batch") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (1L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val batchA = Seq(
      (107L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (127L, "totally novel words that appear nowhere else in any corpus document at all today")).toDF("doc_id", "text")
    val batchB = Seq(
      (217L, "one two three four five six seven eight nine CHANGED"),
      (227L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau CHANGED")).toDF("doc_id", "text")
    val idx = Dedup.buildDedupIndex(corpus)
    for (b <- Seq(batchA, batchB)) {
      val viaIndex = Dedup.admitBatch(idx, b).orderBy(col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val oneShot = Dedup.incrementalDedup(corpus, b).orderBy(col("doc_id"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(viaIndex.toSeq === oneShot.toSeq)
    }
  }

  test("repeated n-gram spans on the fixture: spans exist, lie inside docs, never overlap") {
    val spans = Dedup.repeatedNgramSpans(docs, n = 5).cache()
    assert(spans.count() > 0)
    val lens = docs.select(col("doc_id"), size(split(col("text"), " ")).as("len"))
    // every span inside its doc
    assert(spans.join(lens, "doc_id")
      .filter(col("span_end") > col("len") || col("span_start") < 0).count() === 0)
    // spans of one doc are disjoint and separated (merged maximally)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("span_start"))
    assert(spans.withColumn("prev_end", lag(col("span_end"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("span_start") <= col("prev_end"))
      .count() === 0)
  }

  test("piiRedact: typed sentinels replace every match, counts are exact, clean text untouched") {
    val d = Seq(
      (1L, "mail a.b+c@test.org and x@y.io today"),
      (2L, "call +1-415-555-0199 or +1-212-555-0100 now"),
      (3L, "host 192.168.0.1 and 10.0.0.255 up"),
      (4L, "reach u@10.0.0.1.example.com please"), // ip-shaped subdomain: ONE email, zero ips
      (5L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(d, "text")
      .select("doc_id", "n_email", "n_phone", "n_ip", "redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 2L, 0L, 0L, "mail <EMAIL> and <EMAIL> today")))
    assert(out(1) == ((2L, 0L, 2L, 0L, "call <PHONE> or <PHONE> now")))
    assert(out(2) == ((3L, 0L, 0L, 2L, "host <IP> and <IP> up")))
    assert(out(3) == ((4L, 1L, 0L, 0L, "reach <EMAIL> please")),
      "email redaction must run first so an ip-shaped subdomain is one email, not an ip leak")
    assert(out(4) == ((5L, 0L, 0L, 0L, "no pii here at all")))
    // nothing pattern-shaped survives redaction
    val leaks = TextAnalysis.piiRedact(d, "text")
      .filter(regexp_count(col("redacted"), lit(TextAnalysis.PiiEmail)) > 0 ||
        regexp_count(col("redacted"), lit(TextAnalysis.PiiPhone)) > 0 ||
        regexp_count(col("redacted"), lit(TextAnalysis.PiiIp)) > 0)
      .count()
    assert(leaks === 0)
  }

  test("qualityScoreScaled: exact BIGINT quantization agrees with the double score within one ulp-of-scale, and is exact on constructed docs") {
    // constructed doc: 10 words ("the" is a stopword), all integer inputs
    // known: len=56, nw=10, ns=1, chars=47, awl=4.7 in [3,8] -> w=1000
    // num = 2*10*56 + 1000*min(10,10) + 1000*10 = 1120 + 10000 + 10000 = 21120
    // score = 21120/30000 = 0.704 exactly
    val d = Seq((0L, "the alpha beta gamma delta epsil zetaa etaaa theta iotaa"))
      .toDF("doc_id", "text")
    val got = d.select(TextAnalysis.qualityScoreScaled(col("text"), 9))
      .as[Long].head()
    assert(got === 704000000L, s"expected exact nanos, got $got")
    assert(d.select(TextAnalysis.qualityScoreScaled(col("text"), 4))
      .as[Long].head() === 7040L)
    // corpus-wide: |scaled - round(double*1e9)| <= 1 (they may differ only
    // where the double result sits within an ulp of a half-tie)
    val drift = docs.select(
        TextAnalysis.qualityScoreScaled(col("text"), 9).as("exact"),
        round(TextAnalysis.qualityScore(col("text")) * 1e9, 0).cast("long").as("dbl"))
      .filter(abs(col("exact") - col("dbl")) > 1)
      .count()
    assert(drift === 0, s"$drift docs drift >1 nano between exact and double score")
  }
}
