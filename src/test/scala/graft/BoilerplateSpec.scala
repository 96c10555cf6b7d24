package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpecBase {
  import spark.implicits._

  test("segments repeated across >= minDocs docs are removed, order kept") {
    // "common seg x" appears in docs 1,2,3 (positions vary); unique tails survive
    val docs = Seq(
      (1L, "common seg x alpha beta gamma"),
      (2L, "delta eps zeta common seg x"),
      (3L, "common seg x eta theta iota unique tail"),
      (4L, "nothing shared here at all friend")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateRemove(docs, width = 3, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 2, 1L, "alpha beta gamma")))
    assert(got(1) == ((2L, 2, 1L, "delta eps zeta")))
    // doc 3: 8 words → segments [common seg x][eta theta iota][unique tail]
    assert(got(2) == ((3L, 3, 1L, "eta theta iota unique tail")))
    assert(got(3) == ((4L, 2, 0L, "nothing shared here at all friend")))
  }

  test("identity when the threshold exceeds the corpus size (fixture docs)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val got = TextAnalysis.boilerplateRemove(docs, width = 3, minDocs = 1000)
      .select(col("doc_id"), col("clean_text"))
    val diff = got.join(docs, Seq("doc_id"))
      .filter(col("clean_text") =!= col("text")).count()
    // no segment can reach the threshold → reconstruction must be exact
    assert(diff == 0)
  }

  test("a doc that is entirely boilerplate yields empty text, not a dropped row") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a b c"),
      (4L, "a b c x y z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateRemove(docs, width = 3, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got.take(3).forall { case (_, rem, txt) => rem == 1L && txt == "" })
    assert(got(3) == ((4L, 1L, "x y z")))
  }

  test("short remainder counts as a segment and can survive") {
    val docs = Seq((1L, "a b c dd"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateRemove(docs, width = 3, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 2, 1L, "dd"))) // [a b c] removed, remainder kept
  }
}
