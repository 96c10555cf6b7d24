package graft.operators

import graft.functions.Distances
import graft.index.{Grid, GridConfig, QuantileGridConfig}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact batch kNN join with per-query candidate-cell pruning — the scale
  * form of [[KnnJoin]]: instead of |Q| × |db| distances (broadcast cross),
  * each query joins only the db cells inside its current search box, and
  * unfinished queries widen their box geometrically.
  *
  * Exactness: the box `[q − s, q + s]` per gridded dim contains every
  * point within L2 distance `s` of `q` (any point outside has some
  * |coord diff| > s, hence squared distance > s²). So once a query holds
  * k hits with kth squared distance ≤ s², nothing outside the box can
  * beat them — the same admissible-bound argument as the single-query
  * widening loop (SURVEY §4 O1), vectorized over the query set.
  *
  * Scale: per round, ONE equi-join on cell_id between the (small,
  * broadcastable) exploded query×cells side and the cell-partitioned
  * store — file-level pruning applies; rounds are O(log diameter); the
  * finished-query set leaves the loop, so later (expensive, wide-box)
  * rounds run on the stragglers only.
  *
  * Geometry-generic (r13): the loop sees the grid only through two Column
  * builders — cells-in-box and box-covers-all — so the equal-width
  * [[GridConfig]] and the quantile-calibrated [[QuantileGridConfig]]
  * (whose balanced cells are exactly what skewed corpora need — 19,980 vs
  * 977,885 max-cell at 1M rows, SCALE_NOTES) share one implementation.
  * The box argument above never references bucket geometry, so exactness
  * is untouched: a point outside the candidate cells of `[q−s, q+s]` sits
  * in some dim's bucket strictly outside the span's bucket range, hence
  * its coordinate is beyond a boundary that itself lies outside the span
  * — squared distance > s².
  *
  * Dimensionality regime (measured in ScaleProbe): certification compares
  * the FULL-dim kth distance against the gridded-dims box, so when most
  * of the distance lives in ungridded dims (e.g. 64-dim vectors, 3
  * gridded) no box short of everything certifies and the loop degenerates
  * to a full scan plus round overhead — use [[KnnTopK]] (exact) or
  * [[Ann]] (IVF/LSH, approximate) there. In low-dim fully-gridded data
  * (geo, PCA'd embeddings) the first rounds certify and the join touches
  * a small cell fraction.
  */
object KnnCellJoin {

  /** All cell ids intersecting the per-dim bucket box of `[q−s, q+s]`,
    * as ONE Column expression (flattened cross-product of per-dim bucket
    * ranges — gridDims is plan-time constant). Equal-width geometry. */
  private[operators] def cellsInBox(v: Column, cfg: GridConfig, s: Double): Column = {
    def bucketOfExpr(x: Column): Column =
      least(lit(cfg.partsPerDim - 1L),
        greatest(lit(0L),
          floor(((x - lit(cfg.lower)) / lit(cfg.upper - cfg.lower)) * lit(cfg.partsPerDim.toDouble))))
    val ranges = (0 until cfg.gridDims).map { d =>
      val q = element_at(v, d + 1).cast("double")
      sequence(bucketOfExpr(q - lit(s)), bucketOfExpr(q + lit(s)))
    }
    // fold dims into flat cell ids: acc × nextDimRange
    ranges.zipWithIndex.tail.foldLeft(ranges.head) { case (acc, (rng, d)) =>
      val p = math.pow(cfg.partsPerDim.toDouble, d.toDouble).toLong
      flatten(transform(acc, c => transform(rng, b => c + b * lit(p))))
    }
  }

  /** The quantile sibling: per-dim bucket = count of boundary-table edges
    * ≤ the coordinate (identical rule to [[QuantileGrid.bucket]], applied
    * to the box endpoints), folded mixed-radix with the config's weights.
    * Clamping is inherent — edge buckets are open-ended. */
  private[operators] def cellsInBoxQuantile(v: Column, cfg: QuantileGridConfig,
      s: Double): Column = {
    def bucketOfExpr(x: Column, bs: Seq[Double]): Column =
      bs.map(b => (x >= lit(b)).cast("long")).reduce(_ + _)
    val ranges = (0 until cfg.gridDims).map { d =>
      val q = element_at(v, d + 1).cast("double")
      sequence(bucketOfExpr(q - lit(s), cfg.boundaries(d)),
        bucketOfExpr(q + lit(s), cfg.boundaries(d)))
    }
    ranges.zipWithIndex.tail.foldLeft(ranges.head) { case (acc, (rng, d)) =>
      flatten(transform(acc, c => transform(rng, b => c + b * lit(cfg.weights(d)))))
    }
  }

  /** Exact batch kNN join over an equal-width grid (the original form). */
  def join(queries: DataFrame, indexedDb: DataFrame, cfg: GridConfig, k: Int,
      queryIdCol: String = "query_id", dbIdCol: String = "vec_id",
      vecCol: String = "embedding", bruteForceThreshold: Long = 200000L,
      driverIdLimit: Int = DriverIdLimit): DataFrame = {
    // The box of THIS query covers every grid cell (so its round-result is
    // definitionally final — also the escape hatch for < k total rows and
    // far-out-of-bounds queries whose kth bound can never certify).
    def coversAll(v: Column, radius: Double): Column =
      (0 until cfg.gridDims).map { d =>
        val q = element_at(v, d + 1).cast("double")
        (q - lit(radius) <= lit(cfg.lower)) && (q + lit(radius) >= lit(cfg.upper))
      }.reduce(_ && _)
    joinGeneric(queries, indexedDb, k, cfg.dim,
      (v, s) => cellsInBox(v, cfg, s), coversAll,
      // Widening cap: any finite in-bounds query certifies or full-covers
      // by s ≥ diameter; beyond 4× diameter only NaN components
      // (comparisons all false → never covers) or absurdly far
      // out-of-bounds queries remain. Those get exact brute-force results
      // below instead of looping forever.
      startS = cfg.width, maxS = 4.0 * (cfg.upper - cfg.lower),
      queryIdCol, dbIdCol, vecCol, bruteForceThreshold, driverIdLimit)
  }

  /** Exact batch kNN join over a QUANTILE-calibrated grid — the batch
    * sibling of [[QuantileGrid.prunedKnnDf]]: same widening loop, with the
    * per-dim bucket ranges derived from the calibrated boundary table
    * instead of the uniform bucket formula. Identical results to the
    * brute [[KnnJoin]] (the oracle contract); preferable on skewed
    * corpora where equal-width cells pile up. */
  def joinQuantile(queries: DataFrame, indexedDb: DataFrame,
      cfg: QuantileGridConfig, k: Int,
      queryIdCol: String = "query_id", dbIdCol: String = "vec_id",
      vecCol: String = "embedding", bruteForceThreshold: Long = 200000L,
      driverIdLimit: Int = DriverIdLimit): DataFrame = {
    // full cover = the box spans bucket 0 .. last in every gridded dim
    // (edge buckets are open-ended, so that candidate set IS every cell)
    def coversAll(v: Column, radius: Double): Column =
      (0 until cfg.gridDims).map { d =>
        val q = element_at(v, d + 1).cast("double")
        (q - lit(radius) < lit(cfg.boundaries(d).head)) &&
          (q + lit(radius) >= lit(cfg.boundaries(d).last))
      }.reduce(_ && _)
    // The widening schedule only needs a sane start and a termination cap
    // (correctness never depends on either — stragglers exit via brute
    // force): start at the mean interior boundary gap, cap at 4× the
    // widest boundary span, with floors for degenerate one-boundary dims.
    val startS = math.max(1e-6,
      cfg.boundaries.map(bs =>
        if (bs.size >= 2) (bs.last - bs.head) / (bs.size - 1) else 0.0).max)
    val maxS = math.max(4.0 * cfg.boundaries.map(bs => bs.last - bs.head).max,
      startS * 256)
    joinGeneric(queries, indexedDb, k, cfg.dim,
      (v, s) => cellsInBoxQuantile(v, cfg, s), coversAll,
      startS, maxS, queryIdCol, dbIdCol, vecCol, bruteForceThreshold,
      driverIdLimit)
  }

  /** The widening-loop core, geometry supplied as Column builders. */
  private def joinGeneric(queries: DataFrame, indexedDb: DataFrame, k: Int,
      dim: Int,
      cellsInBoxOf: (Column, Double) => Column,
      coversAll: (Column, Double) => Column,
      startS: Double, maxS: Double,
      queryIdCol: String, dbIdCol: String, vecCol: String,
      bruteForceThreshold: Long, driverIdLimit: Int): DataFrame = {
    val spark = queries.sparkSession
    // Query-side dim validation (the reference asserts vector shape on every
    // call, kd_tree_database.py:84-85): a null or short query embedding would
    // otherwise vanish from cellsInBox/coversAll and loop forever.
    val qs0 = Grid.requireDim(queries, vecCol, dim)
      .select(col(queryIdCol), col(vecCol).as("q_embedding"))
      .localCheckpoint(true)
    // Exact aggregator cross join over a query subset — the fast path for
    // small stores AND the escape hatch for uncertifiable stragglers.
    def bruteOn(qs: DataFrame): DataFrame =
      KnnTopK.topK(
          indexedDb.crossJoin(broadcast(qs))
            .select(col(queryIdCol).as("query_id"), col(dbIdCol).as("vec_id"),
              Distances.squaredL2Cols(col("q_embedding"), col(vecCol), dim).as("dist")),
          k)
        .withColumnRenamed("query_id", queryIdCol)
        .withColumnRenamed("vec_id", dbIdCol)
    // Cost-based path choice (same rule as Knn.prunedSearch): below the
    // threshold the widening loop's per-round jobs cost more than one
    // aggregator cross join; above it, cell pruning skips most of the db
    // per query. Identical results either way (specs pin threshold = 0).
    if (indexedDb.count() <= bruteForceThreshold) return bruteOn(qs0)

    // Driver-tracked finished set for SMALL query batches (the common
    // serving shape; the query side is broadcast every round anyway, so
    // its ids fit on the driver by construction). Cuts the per-round job
    // count from ~5 (topk checkpoint + acc checkpoint + remaining
    // checkpoint + isEmpty + finished join) to 2 (topk checkpoint +
    // finished-id collect): membership tests become `isin` literal
    // filters over the checkpointed query table instead of joins. Large
    // batches (isin over 10k+ literals bloats the plan) keep the
    // DataFrame anti-join loop below.
    if (driverIdLimit > 0) {
      val idProbe = qs0.select(col(queryIdCol)).limit(driverIdLimit + 1).collect()
      if (idProbe.length <= driverIdLimit)
        return joinDriverTracked(qs0, indexedDb, k, dim, cellsInBoxOf,
          coversAll, startS, maxS, queryIdCol, dbIdCol, vecCol,
          idProbe.map(_.get(0)), bruteOn)
    }

    var s = startS // start at one cell width
    var remaining = qs0
    var acc: Option[DataFrame] = None

    while (!remaining.isEmpty && s <= maxS) {
      val cand = remaining
        .withColumn("cell_id", explode(cellsInBoxOf(col("q_embedding"), s)))
      // bounded top-k AGGREGATOR, not a window: the shuffle carries ≤ k
      // rows per query per map task — a window would shuffle and sort
      // EVERY candidate pair (measured 7× slower at 1M rows in ScaleProbe)
      val topk = KnnTopK.topK(
          broadcast(cand).join(indexedDb, "cell_id")
            .select(col(queryIdCol).as("query_id"), col(dbIdCol).as("vec_id"),
              Distances.squaredL2Cols(col("q_embedding"), col(vecCol), dim).as("dist")),
          k)
        .withColumnRenamed("query_id", queryIdCol)
        .withColumnRenamed("vec_id", dbIdCol)
        .localCheckpoint(true)
      // DONE: k hits with kth dist <= s² (nothing outside the box can beat
      // them), or the box already spans every cell.
      val certified = topk.groupBy(col(queryIdCol))
        .agg(count(lit(1)).as("n"), max(col("dist")).as("kth"))
        .filter(col("n") === k && col("kth") <= lit(s * s))
        .select(col(queryIdCol))
      val fullCover = remaining.filter(coversAll(col("q_embedding"), s))
        .select(col(queryIdCol))
      val finishedIds = certified.unionByName(fullCover).distinct()
      val taken = topk.join(finishedIds, queryIdCol)
      acc = Some(acc.map(_.unionByName(taken)).getOrElse(taken).localCheckpoint(true))
      remaining = remaining.join(finishedIds, Seq(queryIdCol), "left_anti")
        .localCheckpoint(true)
      s *= 4
    }
    // Escape hatch for stragglers the box logic can never certify: exact
    // brute force — always correct, and no more work than the all-cells box
    // they were widening toward.
    if (!remaining.isEmpty) {
      val taken = bruteOn(remaining)
      acc = Some(acc.map(_.unionByName(taken)).getOrElse(taken))
    }
    acc.getOrElse(spark.emptyDataFrame)
  }

  /** Query batches up to this size run the driver-tracked loop (ids in a
    * driver set, membership via isin literals). */
  private val DriverIdLimit = 10000

  /** The widening loop with the finished/remaining bookkeeping held on
    * the driver — same rounds, same certification rule, same results as
    * the DataFrame loop; only the set algebra moved off the cluster. */
  private def joinDriverTracked(qs0: DataFrame, indexedDb: DataFrame,
      k: Int, dim: Int,
      cellsInBoxOf: (Column, Double) => Column,
      coversAll: (Column, Double) => Column,
      startS: Double, maxS: Double,
      queryIdCol: String, dbIdCol: String, vecCol: String,
      allIds: Array[Any],
      bruteOn: DataFrame => DataFrame): DataFrame = {
    var remainingIds: Set[Any] = allIds.toSet
    var s = startS
    val accParts = Seq.newBuilder[DataFrame]
    while (remainingIds.nonEmpty && s <= maxS) {
      val rem =
        if (remainingIds.size == allIds.length) qs0
        else qs0.filter(col(queryIdCol).isin(remainingIds.toSeq: _*))
      val cand = rem
        .withColumn("cell_id", explode(cellsInBoxOf(col("q_embedding"), s)))
      val topk = KnnTopK.topK(
          broadcast(cand).join(indexedDb, "cell_id")
            .select(col(queryIdCol).as("query_id"), col(dbIdCol).as("vec_id"),
              Distances.squaredL2Cols(col("q_embedding"), col(vecCol), dim).as("dist")),
          k)
        .withColumnRenamed("query_id", queryIdCol)
        .withColumnRenamed("vec_id", dbIdCol)
        .localCheckpoint(true)
      val certified = topk.groupBy(col(queryIdCol))
        .agg(count(lit(1)).as("n"), max(col("dist")).as("kth"))
        .filter(col("n") === k && col("kth") <= lit(s * s))
        .select(col(queryIdCol))
      val fullCover = rem.filter(coversAll(col("q_embedding"), s))
        .select(col(queryIdCol))
      val finished = certified.unionByName(fullCover).distinct()
        .collect().map(_.get(0)).toSet
      if (finished.nonEmpty) {
        accParts += topk.filter(col(queryIdCol).isin(finished.toSeq: _*))
        remainingIds --= finished
      }
      s *= 4
    }
    if (remainingIds.nonEmpty)
      accParts += bruteOn(
        if (remainingIds.size == allIds.length) qs0
        else qs0.filter(col(queryIdCol).isin(remainingIds.toSeq: _*)))
    accParts.result().reduceOption(_ unionByName _)
      .getOrElse(qs0.sparkSession.emptyDataFrame)
  }
}
