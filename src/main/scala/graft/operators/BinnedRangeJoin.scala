package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join as an EQUI join: the scale path for
  * value-in-[lo,hi) joins when the interval side is too large to
  * broadcast-nested-loop (Spark's only native plan for a pure range
  * predicate). Quantize the fact value into integer bins, replicate each
  * interval to every bin it overlaps, hash-join on the bin, then re-check
  * the exact predicate. Replication factor ≈ interval span / binWidth, so
  * pick binWidth near the typical interval length; the join shuffles both
  * sides on the bin key instead of streaming |fact| × |intervals| pairs.
  *
  * Open-ended intervals (hi = +∞ sentinels) would replicate into unbounded
  * bin sequences — `hiClamp` caps them at the fact domain's known upper
  * bound (a zone-map-style stat) without changing semantics, since the
  * exact predicate re-check keeps correctness for ANY clamp ≥ max(value);
  * a fact value ABOVE the clamp raises at runtime rather than silently
  * missing its interval.
  */
object BinnedRangeJoin {

  def join(fact: DataFrame, valueCol: Column, intervals: DataFrame,
      loCol: String, hiCol: String, binWidth: Double, hiClamp: Double): DataFrame = {
    val binned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(least(col(hiCol), lit(hiClamp)) / binWidth).cast("long"))))
    // a fact value above hiClamp could sit in a bin the clamped interval
    // was never replicated to — that would be SILENT row loss, so raise
    // (codegen'd per-row check, no extra job)
    val guarded = when(valueCol > hiClamp,
      raise_error(concat(lit("BinnedRangeJoin: value "), valueCol.cast("string"),
        lit(s" exceeds hiClamp=$hiClamp; raise hiClamp to >= max(value)"))))
      .otherwise(valueCol)
    fact.withColumn("__fbin", floor(guarded / binWidth).cast("long"))
      .join(binned, col("__fbin") === col("__bin") &&
        valueCol >= col(loCol) && valueCol < col(hiCol))
      .drop("__fbin", "__bin")
  }
}
