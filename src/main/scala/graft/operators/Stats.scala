package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Inferential statistics over grouped metrics — the experiment-readout
  * side of the analytics engine (the chi-square independence test lives
  * with the text crosstabs; this is its continuous-metric sibling).
  *
  * Engine-exactness contract (the [[Drift]]/chi2 pattern): the corpus
  * collapses to per-group exact decimal power sums (n, Σx, Σx²) in ONE
  * map-side-combinable aggregation; every later step runs on |groups|
  * rows in IEEE double with the identical expression tree the oracle SQL
  * evaluates, and outputs are rounded. Per-row terms are quantized
  * (x→3 decimals, x²→6) so the sums are order-independent, and the
  * summed unscaled values stay far below 2^53 so the decimal→double
  * casts round identically in both engines.
  */
object Stats {

  /** Welch's unequal-variance two-sample t-test of each group's metric
    * against the REST of the table — "is this variant's metric different
    * from everyone else's" for every group at once.
    *
    * One aggregation pass gives per-group (n, Σx, Σx²); an unpartitioned
    * window over the |groups|-row result supplies the complement's sums by
    * subtraction (exact in decimal), so the input is scanned ONCE no
    * matter how many groups are tested. Output per group: n, mean, the
    * Welch t statistic and Welch–Satterthwaite degrees of freedom, both
    * rounded to 6 decimals.
    *
    * Requires ≥2 rows in every group and its complement (sample variance
    * needs n-1); groups are assumed non-null. */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = round(col(valueCol), 3)
    val xx = round(x * x, 6)
    val g = df
      .select(col(groupCol).as("grp"),
        x.cast(DecimalType(18, 3)).as("x"),
        xx.cast(DecimalType(18, 6)).as("xx"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("xx")).as("sxx"))
    val w = Window.partitionBy(lit(1))
    val both = g.select(col("grp"), col("n"), col("sx"), col("sxx"),
      (sum(col("n")).over(w) - col("n")).as("rn"),
      (sum(col("sx")).over(w) - col("sx")).as("rsx"),
      (sum(col("sxx")).over(w) - col("sxx")).as("rsxx"))
    def meanOf(s: Column, n: Column): Column = s.cast("double") / n.cast("double")
    def varOf(s: Column, ss: Column, n: Column): Column =
      (ss.cast("double") - s.cast("double") * s.cast("double") / n.cast("double")) /
        (n.cast("double") - lit(1.0))
    val m1 = meanOf(col("sx"), col("n"))
    val m2 = meanOf(col("rsx"), col("rn"))
    val q1 = varOf(col("sx"), col("sxx"), col("n")) / col("n").cast("double")
    val q2 = varOf(col("rsx"), col("rsxx"), col("rn")) / col("rn").cast("double")
    both.select(col("grp"), col("n"), round(m1, 6).as("mean"),
        round((m1 - m2) / sqrt(q1 + q2), 6).as("t_welch"),
        round((q1 + q2) * (q1 + q2) /
          (q1 * q1 / (col("n").cast("double") - lit(1.0)) +
            q2 * q2 / (col("rn").cast("double") - lit(1.0))), 6).as("df_welch"))
  }

  /** Equi-depth (equal-frequency) histogram: bucket boundaries are the
    * exact interpolated i/k quantiles, so every bucket holds ~n/k rows
    * regardless of skew — the histogram an optimizer keeps where a
    * fixed-width one collapses under a heavy tail.
    *
    * Two passes, both flat aggregations: one for the k-1 boundaries
    * (a single 1-row result, broadcast), one to classify and count.
    * Classification is a sum of `value >= b_i` indicators — a codegen'd
    * per-row expression, no join, no sort of the data. Boundaries are
    * interpolated doubles computed identically in both engines (the
    * proven `percentile` ≡ `quantile_cont` contract), so the integer
    * bucket counts are engine-exact with no rounding anywhere.
    *
    * Returns (bucket, n, lo, hi) for non-empty buckets, bucket in [0, k). */
  def equiDepthHistogram(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "equiDepthHistogram: need k >= 2")
    // ONE percentile aggregate over an array of fractions — k-1 separate
    // percentile() calls each build their own full value-frequency map
    // (measured 3.3s → sharing the map collapses the boundary pass to the
    // cost of a single exact-percentile aggregation)
    val fracs = array((1 until k).map(i => lit(i.toDouble / k)): _*)
    val bounds = df.agg(percentile(col(valueCol), fracs).as("__bs"))
      .select((1 until k).map(i => col("__bs").getItem(i - 1).as(s"b$i")): _*)
    val bucket = (1 until k)
      .map(i => when(col(valueCol) >= col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    df.crossJoin(broadcast(bounds))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }
}
