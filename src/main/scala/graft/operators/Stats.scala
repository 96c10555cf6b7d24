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

  /** KMV (k-minimum-values) distinct-count sketch — the sketch-scale
    * analog of the reference's only cardinality operator, `__len__`
    * (vectordb/kd_tree_database.py:307-308, an O(1) dict size): at 100 TB
    * counting distinct KEYS (not rows) needs either a full shuffle or a
    * sketch, and this one stays hash-checkable. Hash every value to
    * [0, 2³²) with the deterministic md5-prefix hash, keep the k SMALLEST
    * distinct hashes, and estimate |distinct| = (k−1) / (h_k / 2³²) — the
    * classic order-statistics estimator (Bar-Yossef et al. 2002). Unlike
    * HyperLogLog registers (whose bias correction is engine-specific,
    * which is why `agg_sketches` is rows-only checked), the KMV estimate
    * is a pure function of a deterministic hash, so the ORACLE REPLAYS IT
    * EXACTLY — a cardinality sketch with a hash-checked cross-engine
    * guarantee.
    *
    * Scale shape: map-side the scan emits hashes; the distinct + top-k
    * runs as TakeOrdered (per-partition k-heap, k-row merge on the
    * driver) — no global sort, shuffle bounded by k·partitions rows. The
    * sketch is mergeable: the k smallest of a union is the k smallest of
    * the concatenated per-split sketches.
    *
    * Returns one row: (k, kth_h, est_distinct, exact_distinct). */
  def kmvDistinct(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k >= 2, "kmvDistinct: need k >= 2")
    val h = graft.operators.Dedup.md5Int32(valueCol.cast("string"))
    val kth = df.select(h.as("__h")).distinct()
      .orderBy(col("__h").asc).limit(k)
      .agg(max(col("__h")).as("kth_h"), count(lit(1)).as("k_actual"))
    val exact = df.agg(countDistinct(valueCol).as("exact_distinct"))
    kth.crossJoin(exact)
      .select(col("k_actual").as("k"), col("kth_h"),
        round((col("k_actual") - lit(1)).cast("double") /
          (col("kth_h").cast("double") / lit(4294967296.0)), 4)
          .as("est_distinct"),
        col("exact_distinct"))
  }

  /** Theta-sketch set algebra on two KMV sketches: the INTERSECTION
    * cardinality of two key sets estimated WITHOUT materializing either
    * side in full — θ = min(θ_A, θ_B) where θ_X is side X's k-th smallest
    * distinct hash; every common hash ≤ θ is in both samples, and
    * |common ≤ θ| / (θ / 2³²) estimates |A ∩ B| (Dasgupta et al., "Theta
    * sketch framework"). Like [[kmvDistinct]] the estimate is a pure
    * function of the deterministic hash — the oracle replays it exactly.
    *
    * Scale shape: each side collapses to ≤ k hashes via TakeOrdered
    * before anything crosses sides; the sample-level intersection is a
    * ≤ k×k-row broadcast-sized join. The exact ground-truth intersection
    * (emitted alongside) is the only corpus-scale join, and it is a
    * distinct + left-semi on the key.
    *
    * Returns one row: (theta_h, n_common, est_intersect, exact_intersect). */
  def thetaIntersect(dfA: DataFrame, dfB: DataFrame, valueColA: Column,
      valueColB: Column, k: Int): DataFrame = {
    require(k >= 2, "thetaIntersect: need k >= 2")
    def hashes(df: DataFrame, c: Column) =
      df.select(graft.operators.Dedup.md5Int32(c.cast("string")).as("h")).distinct()
    def theta(hs: DataFrame) =
      hs.orderBy(col("h").asc).limit(k).agg(max(col("h")).as("th"))
    val ha = hashes(dfA, valueColA)
    val hb = hashes(dfB, valueColB)
    def sample(hs: DataFrame) = hs.orderBy(col("h").asc).limit(k)
    val th = theta(ha).crossJoin(theta(hb).withColumnRenamed("th", "th_b"))
      .select(least(col("th"), col("th_b")).as("theta_h"))
    // join the k-LIMITED samples, not the full distinct hash sets: any
    // common hash ≤ θ = min(θ_A, θ_B) is by definition among BOTH sides'
    // k smallest, so the sample join is value-identical and the exchange
    // is genuinely bounded at k rows per side
    val common = sample(ha).join(sample(hb), "h").crossJoin(th)
      .filter(col("h") <= col("theta_h"))
      .groupBy(col("theta_h")).agg(count(lit(1)).as("n_common"))
    val exact = dfA.select(valueColA.as("__v")).distinct()
      .join(dfB.select(valueColB.as("__v")).distinct(), Seq("__v"), "left_semi")
      .agg(count(lit(1)).as("exact_intersect"))
    th.join(common, Seq("theta_h"), "left").crossJoin(exact)
      .select(col("theta_h"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("n_common"), lit(0L)).cast("double") /
          (col("theta_h").cast("double") / lit(4294967296.0)), 4)
          .as("est_intersect"),
        col("exact_intersect"))
  }
}
