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
}
