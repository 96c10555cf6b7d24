package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy k-center coreset selection (farthest-first traversal, Gonzalez
  * 1985) over an embedding column — diversity-maximizing subset selection
  * for training-data curation: the k selected exemplars 2-approximate the
  * optimal k-center covering radius, so they are the "most spread"
  * k-document sample the corpus admits (the geometric complement of
  * SemDeDup-style near-duplicate PRUNING: instead of removing redundant
  * points, keep the maximally non-redundant ones).
  *
  * Spark shape — built for the 100 TB corpus, not the driver:
  *   - the projected (id, vector) table persists ONCE; every round is one
  *     codegen'd scan + distributed top-1 (`orderBy(..).limit(1)` plans as
  *     `TakeOrderedAndProject`: per-partition top-1, no shuffle of data
  *     rows);
  *   - the min-distance-to-selected column is recomputed per round as a
  *     LEAST over ≤ k codegen'd [[graft.functions.VecMetricLit]] literals
  *     (the selected centers ship inside the plan — bytes, not a join), so
  *     there is ZERO distributed state between rounds and a lost executor
  *     costs nothing but task retry;
  *   - the driver holds k centers (k·dim doubles), never the data.
  * Total work is O(k²/2 · n · dim) flops in k scans: for curation-scale k
  * (tens to a few hundred exemplars) the quadratic term is noise against
  * scan cost. For k in the thousands, flip to maintaining a persisted
  * running min-dist column (k scans of O(n·dim) at the price of a cache
  * rewrite per round) — same results, same round structure.
  *
  * Determinism (the oracle contract): the first center is the minimum id;
  * each next center is the argmax of min-distance-to-selected with ties
  * broken by minimum id; distances are exact squared L2 in doubles with
  * VecMetricLit's left-assoc accumulation, so DuckDB replays the whole
  * greedy chain bit-for-bit as unrolled CTEs.
  *
  * No reference-file analog: the reference has no subset-selection
  * surface (SURVEY §2 north-star family: sampling/curation).
  */
object Coreset {

  /** A selected center: greedy step (0-based), source row id, the point's
    * min squared-L2 distance to the previously selected centers at the
    * moment of selection (−1 for the seed — it had no predecessors), and
    * the vector itself (driver-side copy, fed back into plan literals). */
  final case class Center(step: Int, vecId: Long, rCov: Double, vec: Array[Double])

  /** Run the greedy selection; stops early (returns < k centers) when the
    * corpus has fewer than k distinct vectors (max min-distance hits 0 —
    * every remaining point coincides with a center). */
  def kCenterGreedy(emb: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): Seq[Center] = {
    require(k >= 1, s"k=$k must be >= 1")
    // driver-literal budget (SCALE_NOTES): the selected centers ship in
    // every round's plan as a k×dim double array — 4096×64d ≈ 2 MB of
    // task binary is the comfort ceiling; beyond it, switch to a
    // broadcast-join formulation rather than plan literals
    require(k <= 4096,
      s"k=$k exceeds the 4096 centers-as-plan-literals budget " +
        "(k·dim doubles ride in every round's task binary)")
    val base = emb
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    greedyOver(base, k)
  }

  /** Sampled-page greedy k-center (r16): the exact greedy is k sequential
    * FULL-CORPUS scans — bounded and fine at gate scale, but at 100 TB
    * that is k corpus passes. This variant bounds the passes at ONE: a
    * single scan draws a deterministic candidate page (the `page` lowest
    * (md5(vec_id), vec_id) rows — the repo's hash-order sampling device,
    * uniform w.r.t. any data order and replayable in DuckDB), then the
    * same greedy loop runs its k rounds against the persisted page.
    * Quality: farthest-first on a uniform sample still 2-approximates the
    * SAMPLE's optimal radius; the corpus-level objective degrades only by
    * the sample's covering slack (CoresetSpec pins an empirical bound vs
    * the exact selection on the fixture corpus). Exact path stays the
    * gate-scale default. */
  def kCenterGreedySampled(emb: DataFrame, k: Int, page: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): Seq[Center] = {
    require(page >= k, s"page=$page must be >= k=$k")
    require(page <= 4194304,
      s"page=$page exceeds the 4M-row candidate-page budget " +
        "(the page persists on the cluster; the driver still holds only k centers)")
    val base = emb
      .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"),
        Dedup.md5Int32(col(idCol).cast("string")).as("h"))
      .orderBy(col("h").asc, col("vec_id").asc).limit(page)
      .select(col("vec_id"), col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    greedyOver(base, k)
  }

  /** The shared greedy loop over a persisted (vec_id, v) table — exact
    * over the full corpus, sampled when handed a candidate page. */
  private def greedyOver(base: DataFrame, k: Int): Seq[Center] = {
    try {
      def vecOf(r: Row): Array[Double] =
        r.getSeq[Float](1).map(_.toDouble).toArray
      val seed = base.orderBy(col("vec_id").asc).limit(1).collect()
      if (seed.isEmpty) return Seq.empty
      var centers = Vector(Center(0, seed(0).getLong(0), -1.0, vecOf(seed(0))))
      var done = false
      while (!done && centers.size < k) {
        val md = minDistTo(centers, col("v"))
        val far = base.withColumn("md", md)
          .orderBy(col("md").desc, col("vec_id").asc)
          .limit(1).collect()(0)
        val d = far.getDouble(2)
        if (d <= 0.0) done = true
        else centers = centers :+ Center(centers.size, far.getLong(0), d, vecOf(far))
      }
      centers
    } finally base.unpersist(false)
  }

  /** Min squared-L2 distance to the selected centers, as ONE compact
    * codegen loop ([[graft.functions.VecMinDistL2]]) — bit-equal to
    * `least()` over the per-center [[Distances.squaredL2Lit]] sums (min is
    * exact; identical accumulation order), without the k×dim-term
    * expression tree whose janino compile time dominates at large k. */
  private def minDistTo(centers: Seq[Center], v: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.VecMinDistL2(
      ColumnBridge.expression(v), centers.map(_.vec).toArray))
  }

  /** The selection as a DataFrame: (step, vec_id, r_cov) in step order.
    * r_cov is non-increasing from step 2 on — each greedy pick covers the
    * current farthest point, so the farthest-point distance shrinks. */
  def kCenterSelect(emb: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    kCenterGreedy(emb, k, vecCol, idCol)
      .map(c => (c.step, c.vecId, c.rCov))
      .toDF("step", "vec_id", "r_cov")
  }

  /** [[kCenterGreedySampled]] as a DataFrame — same schema as
    * [[kCenterSelect]]; r_cov is relative to the PAGE (the distances the
    * sampled greedy actually saw). */
  def kCenterSelectSampled(emb: DataFrame, k: Int, page: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    kCenterGreedySampled(emb, k, page, vecCol, idCol)
      .map(c => (c.step, c.vecId, c.rCov))
      .toDF("step", "vec_id", "r_cov")
  }

  /** Coverage summary of the greedy selection: assign EVERY vector to its
    * nearest selected center (exact squared L2; ties → lowest step, the
    * [[graft.functions.VecArgMinL2]] first-min rule) and report per-center
    * population and covering radius. One assignment scan + a k-row
    * aggregate — the coreset-as-stratification device (population skew
    * shows which exemplars anchor dense modes; max_d is the per-cell
    * covering radius, its max over rows the k-center objective). */
  def kCenterAssignSummary(emb: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val centers = kCenterGreedy(emb, k, vecCol, idCol)
    val cents = centers.map(_.vec).toArray
    emb
      .withColumn("step", Ann.ivfCell(col(vecCol), cents))
      .withColumn("d", minDistTo(centers, col(vecCol)))
      .groupBy(col("step"))
      .agg(count(lit(1)).as("n"), max(col("d")).as("max_d"))
      .orderBy(col("step"))
  }
}
