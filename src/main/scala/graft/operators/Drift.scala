package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift monitoring between two slices of a corpus — the
  * check a training-data pipeline runs before a new crawl/period is allowed
  * into the mix (and the generalization of the reference's count invariant,
  * vectordb/kd_tree_database.py:307-319, from "row count unchanged" to
  * "distribution unchanged").
  *
  * Population Stability Index per group: rows carry a group key, a
  * pre-binned feature, and a reference/current flag;
  * PSI = Σ_bins (p_ref − p_cur)·ln(p_ref / p_cur) with Laplace-smoothed
  * proportions p = (n + 0.5) / (N + nBins·0.5), so empty bins are defined
  * and a bin missing from BOTH slices contributes exactly 0 (its smoothed
  * proportions are equal) — observed bins are sufficient. Rule of thumb:
  * psi < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Scale shape: two flat map-side-combinable aggregations (counts per
  * (group, bin, side), then totals) — one shuffle of |groups|×|bins| rows
  * regardless of input size, no window, no join against the raw table.
  * Engine-exactness: ln terms are rounded to 9 decimals and summed as
  * DECIMAL(28,9) (order-independent; the repo-wide quantized-transcendental
  * rule), divisions happen in double on both engines.
  */
object Drift {

  /** PSI per `groupCol`. `binCol` is the pre-binned feature (long),
    * `refCol` a boolean marking the reference slice; `nBins` the total bin
    * count the binning can produce (denominator smoothing mass). Output:
    * (groupCol, psi) — one row per group. */
  def psi(df: DataFrame, groupCol: String, binCol: String, refCol: String,
      nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be positive, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(binCol))
      .agg(
        sum(when(col(refCol), 1L).otherwise(0L)).as("n_ref"),
        sum(when(!col(refCol), 1L).otherwise(0L)).as("n_cur"))
    // per-group totals as a WINDOW over the (tiny) counts table, not a
    // self-join — a join would re-derive the counts subtree and scan the
    // raw input twice in the static plan
    val byGroup = Window.partitionBy(col(groupCol))
    val half = lit(0.5)
    val smoothMass = lit(nBins * 0.5)
    val pa = (col("n_ref").cast("double") + half) /
      (sum(col("n_ref")).over(byGroup).cast("double") + smoothMass)
    val pb = (col("n_cur").cast("double") + half) /
      (sum(col("n_cur")).over(byGroup).cast("double") + smoothMass)
    counts
      .withColumn("__term",
        round((pa - pb) * log(pa / pb), 9).cast(DecimalType(28, 9)))
      .groupBy(col(groupCol))
      .agg(sum(col("__term")).cast("double").as("psi"))
  }
}
