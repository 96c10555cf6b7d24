package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT order statistics without a global sort: the k-th smallest value
  * of a column by recursive bucket-count bisection.
  *
  * Spark's exact `percentile` aggregate buffers every value of a group in
  * one aggregation buffer — fine for per-group medians over bounded
  * groups, a single-node memory cliff for a global quantile over 10¹²
  * rows. The classic distributed-exact alternative needs no sort and no
  * value buffering: count values into B equal-width buckets (one
  * codegen'd aggregation pass), locate the bucket containing the target
  * rank by cumulative counts on the driver (B longs), recurse into that
  * bucket with the rank offset rebased, and only when the candidate set
  * is small (≤ `collectThreshold`) collect-and-sort it exactly. Each
  * level divides the candidate count by ~B, so 10¹² rows reach a
  * collectable slice in 3–4 passes; every pass is a full-scan aggregate
  * whose range predicate pushes to the parquet scan (zone maps prune
  * whole files once the range narrows).
  *
  * Exactness does not depend on floating-point bucket boundaries: the
  * SAME integer bucket expression is used for counting and for the
  * recursion filter, so a value sits in exactly one bucket by
  * construction; rank arithmetic over counts is exact for ties (the k-th
  * order statistic VALUE is unique even when row order under ties is
  * not); an all-equal candidate set (lo == hi) short-circuits to that
  * value. The returned value is an ELEMENT of the column — no arithmetic
  * touches it, so cross-engine comparison is bit-trivial.
  *
  * No reference-file analog (the reference has no aggregation surface);
  * the standard reference is the external-memory selection literature
  * (multi-pass histogram selection).
  */
object OrderStat {

  private val Buckets = 1024

  /** Nulls, NaN and ±Inf are all EXCLUDED up front: a NaN would poison the
    * min/max probe (NaN sorts above everything in Spark, and the bucket
    * expression maps it to null → silently bucket 0 under greatest()), and
    * ±Inf endpoints collapse the bucket ratio to NaN. Rank `k` therefore
    * counts over the finite values only — enforced here, not a caller
    * precondition. */
  private def finiteVals(df: DataFrame, value: Column): DataFrame =
    df.select(value.cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")) &&
        col("v") > lit(Double.NegativeInfinity) &&
        col("v") < lit(Double.PositiveInfinity))

  /** The k-th smallest (1-based, ties counted) value of `value` among the
    * rows of `df`, or None for an empty input or k out of range. Ranks
    * count over FINITE values only (null/NaN/±Inf rows are filtered — see
    * [[finiteVals]]); callers whose rank derives from a raw count() should
    * count with the same finiteness filter. */
  def kthSmallest(df: DataFrame, value: Column, k: Long,
      collectThreshold: Long = 100000L): Option[Double] = {
    require(k >= 1L, s"k=$k must be >= 1")
    val vals = finiteVals(df, value)
    var pred: Column = lit(true)
    var rank = k
    var level = 0
    while (level < 256) {
      level += 1
      val agg = vals.filter(pred)
        .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
        .head()
      val n = agg.getLong(0)
      if (n == 0L || rank > n) return None
      val lo = agg.getDouble(1); val hi = agg.getDouble(2)
      if (lo == hi) return Some(lo)
      if (n <= collectThreshold) {
        val arr = vals.filter(pred).orderBy(col("v").asc)
          .limit(rank.min(Int.MaxValue.toLong).toInt).collect()
        return Some(arr(rank.toInt - 1).getDouble(0))
      }
      // One counting pass: the SAME integer bucket expression drives both
      // the histogram and the next level's filter, so membership is exact.
      val bucketOf = least(lit(Buckets - 1),
        greatest(lit(0), floor((col("v") - lit(lo)) / (lit(hi) - lit(lo)) * Buckets)
          .cast("int")))
      val counts = vals.filter(pred)
        .groupBy(bucketOf.as("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var b = 0
      var cum = 0L
      while (b < Buckets && cum + counts.getOrElse(b, 0L) < rank) {
        cum += counts.getOrElse(b, 0L); b += 1
      }
      rank -= cum
      pred = pred && (bucketOf === lit(b))
    }
    // Each level shrinks the candidate range ≥1024×; even the full double
    // range (≈2100 binades) collapses to a single value within ~210
    // levels, so 256 is unreachable — kept as a loop guard.
    None
  }

  /** WEIGHTED exact selection: the smallest value v such that the total
    * weight of rows with value ≤ v reaches `targetW` — e.g. the
    * volume-weighted median at targetW = (ΣW + 1) / 2, or a token-weighted
    * corpus quantile. Same bisection as [[kthSmallest]] with per-bucket
    * LONG weight sums instead of counts (integer weights keep every
    * cumulative exactly reproducible across engines and partitionings —
    * a double weight sum's order-dependent rounding could flip a bucket
    * decision at a boundary). Rows with weight ≤ 0 are excluded. The
    * row-count threshold still bounds the collected slice, so skewed
    * weights never enlarge driver memory. Non-finite values are filtered
    * like [[kthSmallest]] (see [[finiteVals]]). */
  def weightedRankSmallest(df: DataFrame, value: Column, weight: Column,
      targetW: Long, collectThreshold: Long = 100000L): Option[Double] = {
    require(targetW >= 1L, s"targetW=$targetW must be >= 1")
    val vals = df.select(value.cast("double").as("v"), weight.cast("long").as("w"))
      .filter(col("v").isNotNull && !isnan(col("v")) &&
        col("v") > lit(Double.NegativeInfinity) &&
        col("v") < lit(Double.PositiveInfinity) && col("w") > 0L)
    var pred: Column = lit(true)
    var target = targetW
    var level = 0
    while (level < 256) {
      level += 1
      val agg = vals.filter(pred)
        .agg(count(lit(1)).as("n"), sum(col("w")).as("tw"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
        .head()
      val n = agg.getLong(0)
      if (n == 0L || target > agg.getLong(1)) return None
      val lo = agg.getDouble(2); val hi = agg.getDouble(3)
      if (lo == hi) return Some(lo)
      if (n <= collectThreshold) {
        val rows = vals.filter(pred).orderBy(col("v").asc).collect()
        var cum = 0L
        var i = 0
        while (i < rows.length) {
          cum += rows(i).getLong(1)
          if (cum >= target) return Some(rows(i).getDouble(0))
          i += 1
        }
        return None // unreachable: target ≤ tw was checked above
      }
      val bucketOf = least(lit(Buckets - 1),
        greatest(lit(0), floor((col("v") - lit(lo)) / (lit(hi) - lit(lo)) * Buckets)
          .cast("int")))
      val weights = vals.filter(pred)
        .groupBy(bucketOf.as("b")).agg(sum(col("w")).as("tw"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var b = 0
      var cum = 0L
      while (b < Buckets && cum + weights.getOrElse(b, 0L) < target) {
        cum += weights.getOrElse(b, 0L); b += 1
      }
      target -= cum
      pred = pred && (bucketOf === lit(b))
    }
    None
  }
}
