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
