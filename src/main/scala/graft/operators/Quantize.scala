package graft.operators

import graft.oracle.DuckSql
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar (int8) vector quantization — the memory-side ANN companion to
  * IVF ([[Ann]]) and PQ ([[Pq]]): each float32 component maps to an int8
  * code `clamp(floor(x/scale + 0.5), -127, 127)`, shrinking vectors 4× and
  * turning distance evaluation into pure integer arithmetic (SIMD-friendly
  * under whole-stage codegen, and EXACTLY reproducible in the DuckDB
  * oracle — unlike IVF/PQ whose codebooks are data-derived, SQ8 with a
  * fixed scale is deterministic end-to-end, so the driver hash-checks it).
  *
  * `floor(x + 0.5)` rather than `round(x)`: both engines floor identically
  * on every double, while round's half-away/half-even edge behavior is a
  * cross-engine hazard.
  *
  * Scale design: quantization is per-row (zero shuffles); a quantized
  * 100 TB corpus is 25 TB, and the integer top-k is the same
  * `TakeOrderedAndProject` plan as exact kNN. Standard recipe: SQ8 scan
  * for candidates, exact float re-rank of the top ~4k (same shape as
  * [[Pq.search]]'s ADC + re-rank).
  */
object Quantize {

  /** Quantize one double value driver-side (for query literals). */
  def q8(x: Double, scale: Double): Long =
    math.max(-127L, math.min(127L, math.floor(x / scale + 0.5).toLong))

  /** Quantize a float-array column to int8 codes (as longs, so the
    * downstream integer distance never overflows/casts). */
  def quantize(vec: Column, scale: Double): Column =
    transform(vec, x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") / lit(scale) + lit(0.5)).cast("long"))))

  /** Quantize ONE component of a raw float vector — scalar expression, no
    * higher-order function, so the unrolled distance below stays inside
    * whole-stage codegen. */
  private def q8Elem(vec: Column, i: Int, scale: Double): Column =
    greatest(lit(-127L), least(lit(127L),
      floor(element_at(vec, i + 1).cast("double") / lit(scale) + lit(0.5)).cast("long")))

  /** Integer squared-L2 between a (raw float) vector column and a
    * pre-quantized query literal — per-element inline quantization,
    * unrolled like Distances.squaredL2Lit. NOT built on [[quantize]]: a
    * higher-order `transform` is CodegenFallback, and referencing the
    * whole-array transform once per unrolled dimension would evaluate it
    * O(dim²) interpreted — the argmin-regression class ScaleProbe exists
    * to catch. */
  def sq8DistLit(vec: Column, scale: Double, q: Array[Double]): Column = {
    val qq = q.map(q8(_, scale))
    qq.indices.map { i =>
      val d = q8Elem(vec, i, scale) - lit(qq(i))
      d * d
    }.reduce(_ + _)
  }

  /** DuckDB mirror of [[sq8DistLit]] — same casts, same clamp, same
    * left-assoc sum. */
  def sq8DistLitSql(col: String, scale: Double, q: Array[Double]): String = {
    val s = DuckSql.fmt(scale)
    val qq = q.map(q8(_, scale))
    def qElem(i: Int): String =
      s"GREATEST(CAST(-127 AS BIGINT), LEAST(CAST(127 AS BIGINT), CAST(FLOOR(${DuckSql.elem(col, i)} / $s + ${DuckSql.fmt(0.5)}) AS BIGINT)))"
    qq.indices.map { i =>
      val d = s"(${qElem(i)} - CAST(${qq(i)} AS BIGINT))"
      s"($d * $d)"
    }.mkString("(", " + ", ")")
  }
}
