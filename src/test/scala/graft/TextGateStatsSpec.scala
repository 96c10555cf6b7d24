package graft

import graft.core.Fixtures
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Pins the one-pass [[graft.functions.TextGateStats]] kernel to the
  * split/filter formulations it replaced (r17): identical values for
  * n_chars / n_words / n_stopwords on the fixture corpus AND on
  * adversarial strings (empty, spaces only, leading/trailing/double
  * spaces, multi-byte UTF-8, stopword-shaped substrings). The gate
  * (quality, lang_pred) feeds a dozen oracle-checked pipelines, so the
  * kernel must be bit-equal, not approximately equal. */
class TextGateStatsSpec extends SparkSpecBase {

  private def gs(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(graft.functions.TextGateStats(
      ColumnBridge.expression(c), Fixtures.Stopwords))

  private def refWords(c: org.apache.spark.sql.Column) = split(c, " ")
  private def refNWords(c: org.apache.spark.sql.Column) = size(refWords(c))
  private def refNStop(c: org.apache.spark.sql.Column) =
    size(filter(refWords(c), w => w.isInCollection(Fixtures.Stopwords)))

  test("kernel equals split/filter forms on the fixture corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = docs.select(
        gs(col("text")).as("st"),
        length(col("text")).cast("long").as("e_chars"),
        refNWords(col("text")).cast("long").as("e_words"),
        refNStop(col("text")).cast("long").as("e_stop"))
      .filter(col("st").getItem(0) =!= col("e_chars") ||
        col("st").getItem(1) =!= col("e_words") ||
        col("st").getItem(2) =!= col("e_stop"))
      .count()
    assert(bad === 0L)
  }

  test("kernel equals split/filter forms on adversarial strings") {
    import spark.implicits._
    val rows = Seq(
      "", " ", "  ", "the", " the", "the ", "a  of", "athe the thea",
      "the of and to in is it for on a", "x", "über die straße",
      "naïve café the", "日本語 の テスト the", "it  ", "  it",
      "ofof of fof", "a a a a", "tHe The THE")
    val df = rows.toDF("text")
    val got = df.select(
      gs(col("text")).as("st"),
      length(col("text")).cast("long").as("e_chars"),
      refNWords(col("text")).cast("long").as("e_words"),
      refNStop(col("text")).cast("long").as("e_stop")).collect()
    got.foreach { r =>
      val st = r.getSeq[Long](0)
      assert(st(0) === r.getLong(1), s"n_chars on ${r}")
      assert(st(1) === r.getLong(2), s"n_words on ${r}")
      assert(st(2) === r.getLong(3), s"n_stopwords on ${r}")
    }
  }

  test("null text stays null") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("the a")).toDF("text")
    val got = df.select(gs(col("text")).as("st")).collect()
    assert(got.exists(_.isNullAt(0)))
    assert(got.exists(r => !r.isNullAt(0)))
  }

  test("gate-derived columns keep their pre-r17 types (oracle schema pin)") {
    import spark.implicits._
    val df = Seq("the quick brown fox of doom").toDF("text")
    val out = df.select(
      graft.operators.TextAnalysis.nWords(col("text")).as("n_words"),
      graft.operators.TextAnalysis.nStopwords(col("text")).as("n_stopwords"),
      graft.operators.TextAnalysis.qualityScore(col("text")).as("q"),
      graft.operators.TextAnalysis.avgWordLen(col("text")).as("awl"))
    assert(out.schema("n_words").dataType.typeName === "integer")
    assert(out.schema("n_stopwords").dataType.typeName === "integer")
    assert(out.schema("q").dataType.typeName === "double")
    assert(out.schema("awl").dataType.typeName === "double")
    val r = out.head()
    assert(r.getInt(0) === 6)
    assert(r.getInt(1) === 2)
  }
}
