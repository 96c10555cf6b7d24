package graft

import graft.operators.Decontam

class DecontamSpec extends SparkSpecBase {
  import spark.implicits._

  test("ngramOverlap counts shared 4-grams and keeps zero-overlap docs") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      // shares "the quick brown fox" and "quick brown fox jumps"
      (1L, "said the quick brown fox jumps high today"),
      // no shared 4-gram (words overlap, order differs)
      (2L, "fox brown quick the dog lazy over jumps"),
      // shares "over the lazy dog"
      (3L, "it rolled over the lazy dog yesterday")).toDF("doc_id", "text")
    val got = Decontam.ngramOverlap(train, bench, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, true), (2L, 0L, false), (3L, 1L, true)))
  }

  test("a doc shorter than n words is never flagged") {
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq((1L, "a b c")).toDF("doc_id", "text")
    val got = Decontam.ngramOverlap(train, bench, n = 4).collect()
    assert(got.length == 1 && got(0).getLong(1) == 0L)
  }

  test("bloomNgramFlags: exact-contaminated ⊆ bloom-flagged (no false negatives); short docs unflagged") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)
    val train = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0)
    val exact = Decontam.ngramOverlap(train, bench, n = 4).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val bloom = Decontam.bloomNgramFlags(train, bench, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(bloom.length == exact.size)
    bloom.foreach { case (id, nf, flag) =>
      assert(flag == (nf > 0))
      if (exact(id)) assert(flag, s"doc $id exact-contaminated but bloom missed it")
    }
    // both verdicts must occur on the fixture (an all-true/all-false gate tests nothing)
    assert(bloom.map(_._3).distinct.length == 2)
  }

  test("bloomNgramFlags on a tiny corpus: flags at least the exact hits, doc under n words gets 0") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "said the quick brown fox jumps high today"),
      (2L, "a b c")).toDF("doc_id", "text")
    val got = Decontam.bloomNgramFlags(train, bench, n = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(got.head._1 == 1L && got.head._2 >= 2L && got.head._3)
    assert(got(1) == ((2L, 0L, false)))
  }

  test("exactSpans merges overlapping verified grams into maximal spans") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      // one 6-word run (grams at pos 1 and 2 overlap → one span of 5+1
      // words) plus a separate 4-word run later in the doc
      (1L, "said the quick brown fox jumps x y over the lazy dog z"),
      // clean: no shared 4-gram
      (2L, "fox brown quick the dog lazy over jumps")).toDF("doc_id", "text")
    val got = Decontam.exactSpans(train, bench, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: spans [1,6) len 5 and [8,12) len 4 → 2 spans, max 5, 3 grams
    assert(got.toSeq == Seq((1L, 2L, 5L, 3L)))
  }

  test("exactSpans counts each position once even if many bench docs share it") {
    val bench = Seq((100L, "a b c d"), (101L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq((1L, "x a b c d e")).toDF("doc_id", "text")
    val got = Decontam.exactSpans(train, bench, n = 4).collect()
    // verified grams at pos 1 ("a b c d") and 2 ("b c d e") → one span [1,6)
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 5L, 2L)))
  }

  test("exactSpans positions survive a gram repeated earlier in the doc") {
    // "a b c d" occurs at pos 0 AND pos 5 — a distinct-shingle pipeline
    // would collapse them and misplace the second span
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq((1L, "a b c d x a b c d e")).toDF("doc_id", "text")
    val got = Decontam.exactSpans(train, bench, n = 4).collect()
    assert(got.length == 1)
    val r = got.head
    // verified pos {0, 5, 6} → spans [0,4) and [5,10): 2 spans, max 5, 3 grams
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 5L, 3L)))
  }

  test("fused bloom kernel ≡ the exploded shingle/md5 formulation (r17)") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    // fixture corpus at sf0.001 — real text incl. docs with repeated grams
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val n = 4; val mBits = 1 << 16; val k = 3
    val got = Decontam.bloomNgramFlags(train, bench, n = n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // the pre-r17 exploded formulation, inlined
    def positions(h1: org.apache.spark.sql.Column, h2: org.apache.spark.sql.Column) =
      (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong)))
    val benchPos = bench
      .select(explode(Dedup.shingles(col("text"), n)).as("g"))
      .select(Dedup.md5Int32(col("g")).as("h1"),
        Dedup.md5Int32(concat(lit("b:"), col("g"))).as("h2"))
      .select(explode(array(positions(col("h1"), col("h2")): _*)).as("p"))
      .distinct().collect().map(_.getLong(0).toInt)
    val mask = new Array[Long](mBits / 64)
    benchPos.foreach(p => mask(p >> 6) |= (1L << (p & 63)))
    val maskLit = typedlit(mask.toSeq)
    def member(h1: org.apache.spark.sql.Column, h2: org.apache.spark.sql.Column) =
      positions(h1, h2).map { p =>
        call_function("shiftright",
            element_at(maskLit, (p / 64L).cast("int") + 1),
            (p % 64L).cast("int"))
          .bitwiseAND(lit(1L)) === lit(1L)
      }.reduce(_ && _)
    val want = train
      .select(col("doc_id"), explode_outer(Dedup.shingles(col("text"), n)).as("g"))
      .select(col("doc_id"), Dedup.md5Int32(col("g")).as("h1"),
        Dedup.md5Int32(concat(lit("b:"), col("g"))).as("h2"))
      .groupBy(col("doc_id"))
      .agg(sum(when(member(col("h1"), col("h2")), 1L).otherwise(0L)).as("nf"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(1) > 0L)).toMap
    assert(got == want)
  }
}
