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
