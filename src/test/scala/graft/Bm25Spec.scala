package graft

import graft.operators.TextAnalysis

class Bm25Spec extends SparkSpecBase {
  import spark.implicits._

  test("BM25 ranks term-bearing docs above term-free docs; tf saturates") {
    val docs = Seq(
      (1L, "spark spark spark spark"), // high tf, short
      (2L, "spark other words here"), // tf=1
      (3L, "no relevant terms at all"), // tf=0
      (4L, "spark spark filler filler filler filler filler filler") // tf=2, long
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, Seq("spark"), k = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.map(_._1).take(2).toSet == Set(1L, 4L),
      s"multi-tf docs must lead: $got")
    val score = got.toMap
    assert(score(1L) > score(2L) && score(2L) > score(3L))
    assert(score(3L) == 0.0)
    // saturation: 4x tf is NOT 4x score
    assert(score(1L) < 4 * score(2L))
  }

  test("inverted postings: df counts distinct docs, lists sorted ascending") {
    val docs = Seq(
      (5L, "b a"), (2L, "a a c"), (9L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedPostings(docs, minDf = 2).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Long](2).toList)).toSet
    // a in 5,2,9; b in 5,9; c only once (filtered by minDf)
    assert(got == Set(("a", 3L, List(2L, 5L, 9L)), ("b", 2L, List(5L, 9L))))
  }
}
