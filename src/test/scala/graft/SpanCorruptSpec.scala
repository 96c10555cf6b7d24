package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Span-corruption invariants: the (input, target) pair must be a LOSSLESS
  * re-encoding of the original document — splicing each target span back
  * into its input sentinel reproduces the original text exactly — and the
  * span/mask counts must be consistent. */
class SpanCorruptSpec extends SparkSpecBase {

  private val sentinel = "<extra_id_(\\d+)>".r

  /** Reconstruct the original text from (input, target): walk the input,
    * replacing sentinel k with target span k (the tokens between sentinel
    * k and the next sentinel). */
  private def reconstruct(input: String, target: String): String = {
    val spans: Map[Int, Seq[String]] =
      if (target.isEmpty) Map.empty
      else {
        val toks = target.split(" ").toSeq
        val marks = toks.zipWithIndex.collect {
          case (sentinel(k), i) => (k.toInt, i)
        }
        marks.zipWithIndex.map { case ((k, start), mi) =>
          val end = if (mi + 1 < marks.length) marks(mi + 1)._2 else toks.length
          k -> toks.slice(start + 1, end)
        }.toMap
      }
    input.split(" ").toSeq.flatMap {
      case sentinel(k) => spans(k.toInt)
      case w => Seq(w)
    }.mkString(" ")
  }

  test("input + target splice back to the original text; counts consistent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
    val out = TextAnalysis.spanCorrupt(docs, maskMod = 5)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (in, tgt, text) = (r.getAs[String]("input_text"),
        r.getAs[String]("target_text"), r.getAs[String]("text"))
      assert(reconstruct(in, tgt) == text,
        s"doc ${r.getAs[Long]("doc_id")}: reconstruction mismatch")
      val nSpans = r.getAs[Long]("n_spans")
      val nMasked = r.getAs[Long]("n_masked")
      val sentinelsInTarget =
        if (tgt.isEmpty) 0 else tgt.split(" ").count(sentinel.matches)
      assert(sentinelsInTarget == nSpans)
      val maskedInTarget =
        if (tgt.isEmpty) 0 else tgt.split(" ").length - sentinelsInTarget
      assert(maskedInTarget == nMasked)
    }
  }

  test("maskMod=1 masks everything into one span per doc") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 30)
    TextAnalysis.spanCorrupt(docs, maskMod = 1).collect().foreach { r =>
      assert(r.getAs[Long]("n_spans") == 1L)
      assert(r.getAs[String]("input_text") == "<extra_id_1>")
    }
  }
}
