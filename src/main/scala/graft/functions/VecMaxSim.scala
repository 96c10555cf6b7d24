package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused column-vs-column MaxSim kernel.
  *
  * The composed-Column form ([[graft.operators.LateInteraction.maxSimCols]]
  * before r10) unrolled nSub² dots × w multiply-adds plus a `round(_, 9)`
  * per dot into a ~dim·nSub-node expression tree — at (64, 4) that is a
  * thousand-node codegen method, past JIT inlining budgets (measured 2.1 s
  * for a 40k-pair join at sf0.1; the single-literal form with the same
  * arithmetic runs 7× faster per eval). This kernel runs the identical
  * arithmetic as one JVM loop:
  *   - sub-dot (i, j) = Σ_t (double)q[i·w+t] · (double)v[j·w+t],
  *     left-associated ascending t — exactly `dotColsOffsetUnrolled`;
  *   - per-dot rounding = java BigDecimal.valueOf → setScale(9, HALF_UP)
  *     → doubleValue, which is bit-for-bit Spark's `round(col, 9)` on
  *     DoubleType (and DuckDB's half-away-from-zero `round(x, 9)`);
  *   - per-i max over j (no tie-break needed for a max of doubles), summed
  *     left-associated ascending i — exactly `greatest(...)` + `reduce(_ + _)`.
  * Null contract matches the Vec* expression family: null when either
  * array is null, shorter than dim, or has a null element.
  */
object MaxSimKernel extends Serializable {
  def maxSim(q: ArrayData, v: ArrayData, dim: Int, nSub: Int): Any = {
    if (q == null || v == null) return null
    if (q.numElements() < dim || v.numElements() < dim) return null
    var c = 0
    while (c < dim) {
      if (q.isNullAt(c) || v.isNullAt(c)) return null
      c += 1
    }
    val w = dim / nSub
    var sum = 0.0
    var si = 0
    while (si < nSub) {
      var best = Double.NegativeInfinity
      var sj = 0
      while (sj < nSub) {
        var dot = 0.0
        var t = 0
        while (t < w) {
          dot += q.getFloat(si * w + t).toDouble * v.getFloat(sj * w + t).toDouble
          t += 1
        }
        val r = java.math.BigDecimal.valueOf(dot)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        if (r > best) best = r
        sj += 1
      }
      sum += best
      si += 1
    }
    sum
  }
}

case class VecMaxSimCols(left: Expression, right: Expression,
    dim: Int, nSub: Int) extends BinaryExpression {
  require(nSub > 0 && dim % nSub == 0, s"dim $dim not divisible by $nSub")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecMetric.checkArrayOfFloat(left.dataType, "query vector")
    if (l.isFailure) l else VecMetric.checkArrayOfFloat(right.dataType, "doc vector")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecMaxSimCols =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_maxsim_cols"

  override def nullSafeEval(q: Any, v: Any): Any =
    MaxSimKernel.maxSim(q.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData], dim, nSub)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (q, v) => {
      val res = ctx.freshName("res")
      s"""
         |Object $res = graft.functions.MaxSimKernel.maxSim($q, $v, $dim, $nSub);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $res).doubleValue();
         |}
       """.stripMargin
    })
  }
}
