package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Case-folding ASCII letter histogram: one pass over the string's UTF-8
  * bytes → 26 counts (`'a'+'A'` → slot 0, …). Replaces the 26-`translate`
  * (52 string scans per row) formulation of the letter-entropy quality
  * signal with a single scan that stays inside whole-stage codegen.
  *
  * Byte-loop correctness on UTF-8: ASCII letters only ever appear as
  * single bytes 0x41-0x5A / 0x61-0x7A — multi-byte code points use bytes
  * ≥ 0x80 throughout, so non-ASCII text contributes nothing (the same
  * contract as counting `[a-z]` occurrences of `lower(text)` for ASCII
  * input, which is what the DuckDB oracle replays). */
case class LetterHistogram(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text must be STRING, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): LetterHistogram =
    copy(child = newChild)
  override def prettyName: String = "letter_histogram"

  override def nullSafeEval(input: Any): Any = {
    val bs = input.asInstanceOf[UTF8String].getBytes
    val cnt = new Array[Long](26)
    var i = 0
    while (i < bs.length) {
      val b = bs(i)
      if (b >= 'a' && b <= 'z') cnt(b - 'a') += 1
      else if (b >= 'A' && b <= 'Z') cnt(b - 'A') += 1
      i += 1
    }
    new GenericArrayData(cnt)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bs = ctx.freshName("bs")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""byte[] $bs = $str.getBytes();
         |long[] $cnt = new long[26];
         |for (int $i = 0; $i < $bs.length; $i++) {
         |  byte $b = $bs[$i];
         |  if ($b >= 97 && $b <= 122) $cnt[$b - 97]++;
         |  else if ($b >= 65 && $b <= 90) $cnt[$b - 65]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cnt);
         |""".stripMargin
    })
}

/** One-pass text gate statistics: `[n_chars, n_words, n_stopwords]` over
  * the raw UTF-8 bytes, where
  *   - n_chars ≡ `length(text)` (code points: bytes that are not UTF-8
  *     continuation bytes),
  *   - n_words ≡ `size(split(text, " ", -1))` (= #spaces + 1; split on the
  *     single ASCII space keeps empty segments, and 0x20 can only BE the
  *     space code point in UTF-8),
  *   - n_stopwords ≡ `size(filter(split(text, " ", -1), w -> w IN stops))`
  *     (byte-equality of each segment against the stop list).
  *
  * Why it exists (r17, guide §4 "eliminate non-codegen expressions"):
  * the `filter(..., lambda)` form is a CodegenFallback, which drops the
  * ENTIRE projection containing it out of whole-stage codegen — the
  * quality/language gate feeds a dozen pipeline queries, and their gate
  * stages ran interpreted with `split()` re-evaluated up to 5× per row
  * (pipeline_release_funnel's fused head: 13 s of summed executor CPU on
  * 5000 docs at local[32]). This expression is ONE byte scan per row, and
  * both eval and codegen call the same static kernel, so plans containing
  * it stay inside whole-stage codegen. Identical-value contract covered by
  * TextGateStatsSpec (vs the split/filter forms) and the oracle gate. */
case class TextGateStats(child: Expression, stops: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text must be STRING, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): TextGateStats =
    copy(child = newChild)
  override def prettyName: String = "text_gate_stats"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stops.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextGateStats.compute(
      input.asInstanceOf[UTF8String], stopBytes))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, str =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextGateStats.compute($str, $stopsRef));
         |""".stripMargin)
  }
}

object TextGateStats {
  /** Shared eval/codegen kernel — see the case-class doc for the exact
    * split/filter equivalences it must preserve. */
  def compute(s: UTF8String, stops: Array[Array[Byte]]): Array[Long] = {
    val bs = s.getBytes
    var nChars = 0L
    var nWords = 1L
    var nStop = 0L
    var segStart = 0
    def segIsStop(from: Int, until: Int): Boolean = {
      val len = until - from
      var k = 0
      while (k < stops.length) {
        val st = stops(k)
        if (st.length == len) {
          var j = 0
          while (j < len && bs(from + j) == st(j)) j += 1
          if (j == len) return true
        }
        k += 1
      }
      false
    }
    var i = 0
    while (i < bs.length) {
      val b = bs(i)
      if ((b & 0xC0) != 0x80) nChars += 1
      if (b == ' ') {
        nWords += 1
        if (segIsStop(segStart, i)) nStop += 1
        segStart = i + 1
      }
      i += 1
    }
    if (segIsStop(segStart, bs.length)) nStop += 1
    Array(nChars, nWords, nStop)
  }
}
