package graft.operators

import graft.functions.Distances
import graft.index.{Grid, GridConfig}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Filtered k-nearest-neighbor search — the reference's flagship query
  * (reference API: vectordb/database.py:31-48, impl:
  * vectordb/kd_tree_database.py:285-304).
  *
  * Semantics preserved exactly (SURVEY.md §7 hard parts):
  *  - the metadata filter applies BEFORE top-k selection
  *    (kd_tree_database.py:186-190);
  *  - default metric is SQUARED L2 (kd_tree_database.py:243, no sqrt);
  *  - deterministic total order `(dist ASC, id ASC)` replaces the
  *    reference's insertion-order tie-break.
  *
  * Physical plan: `Scan → Filter → Project(+dist) → TakeOrderedAndProject`
  * — Spark's distributed top-k (per-partition heap + driver merge), the
  * built-in equivalent of the reference's per-leaf truncate-and-merge
  * (kd_tree_database.py:159-161, 191-195). No full sort, no full shuffle;
  * scales linearly with executors at 100 TB.
  */
object Knn {

  /** Brute-force exact kNN: distance over every (filtered) row + top-k. */
  def bruteForce(
      db: DataFrame,
      distExpr: Column,
      k: Int,
      idCol: String = "vec_id",
      pred: Option[Column] = None,
      keep: Seq[String] = Seq("vec_id", "label")): DataFrame = {
    val filtered = pred.map(db.filter).getOrElse(db)
    filtered
      .withColumn("dist", distExpr)
      .select((keep.map(col) :+ col("dist")): _*)
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** Result row of a pruned search (kept scalar so it round-trips through
    * createDataFrame deterministically). */
  final case class Neighbor(vec_id: Long, label: Int, dist: Double)

  /** Exact kNN with grid-partition pruning and iterative candidate-cell
    * widening — the batch re-expression of the reference's best-first tree
    * descent with plane-distance bounds (kd_tree_database.py:149-221,
    * SURVEY.md §4 O1).
    *
    * Driver ranks all non-empty cells by a closed-form lower bound (cheap:
    * O(numCells) scalar math), scans the nearest cells (Catalyst pushes the
    * `cell_id isin` predicate into the scan → partition pruning on a
    * cell-partitioned table), and widens until the kth distance is ≤ the
    * next unscanned cell's bound — the same stop rule as the reference's
    * `bound > current_neighbors[-1]` break (kd_tree_database.py:213-218).
    *
    * `cellCounts` (cell_id → rows) is computed once per index build and
    * reused across queries — the analog of the tree structure itself.
    */
  def prunedSearch(
      indexed: DataFrame,
      cfg: GridConfig,
      q: Array[Double],
      k: Int,
      pred: Option[Column] = None,
      cellBound: (Array[Double], Long, GridConfig) => Double = Grid.cellLowerBoundSqL2,
      distExpr: Option[Column] = None,
      cellCountsCache: Option[Map[Long, Long]] = None,
      bruteForceThreshold: Long = 200000L): Seq[Neighbor] =
    prunedSearchBound(indexed,
      distExpr.getOrElse(Distances.squaredL2Lit(col("embedding"), q)), k,
      cell => cellBound(q, cell, cfg), pred, cellCountsCache,
      bruteForceThreshold)

  /** Geometry-generic core of [[prunedSearch]]: the ranking + widening loop
    * over an OPAQUE cell lower-bound function, so any grid that can price
    * a cell (equal-width [[GridConfig]], the quantile-calibrated
    * [[graft.index.QuantileGridConfig]], …) reuses the same exact search.
    * Correctness needs only admissibility: `bound(cell)` ≤ the true
    * distance from the query to every point bucketed into `cell`. */
  def prunedSearchBound(
      indexed: DataFrame,
      dist: Column,
      k: Int,
      bound: Long => Double,
      pred: Option[Column] = None,
      cellCountsCache: Option[Map[Long, Long]] = None,
      bruteForceThreshold: Long = 200000L): Seq[Neighbor] = {

    val cellCounts: Map[Long, Long] = cellCountsCache.getOrElse {
      indexed.groupBy("cell_id").count().collect()
        .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    }
    if (cellCounts.isEmpty) return Seq.empty // empty DB → empty result (tests:70-77)

    // Rank non-empty cells by lower bound, ascending.
    val ranked: Array[(Long, Double, Long)] = cellCounts.toArray
      .map { case (cell, n) => (cell, bound(cell), n) }
      .sortBy { case (cell, b, _) => (b, cell) }

    // Cost-based path choice: below the threshold, one codegen'd full scan
    // is cheaper than the widening loop's multiple scan+collect jobs (the
    // per-job overhead, not the data, dominates small stores). Above it,
    // candidate-cell pruning skips whole files. Same exact result either
    // way — the specs pin pruned ≡ brute with bruteForceThreshold = 0.
    if (cellCounts.values.sum <= bruteForceThreshold) {
      val filtered = pred.map(indexed.filter).getOrElse(indexed)
      return filtered
        .withColumn("dist", dist)
        .select(col("vec_id"), col("label"), col("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(k)
        .collect()
        .map(r => Neighbor(r.getLong(0), r.getInt(1), r.getDouble(2)))
        .toSeq
    }

    def scanCells(cells: Seq[Long]): Seq[Neighbor] = {
      val base = indexed.filter(col("cell_id").isin(cells: _*))
      val filtered = pred.map(base.filter).getOrElse(base)
      filtered
        .withColumn("dist", dist)
        .select(col("vec_id"), col("label"), col("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(k)
        .collect()
        .map(r => Neighbor(r.getLong(0), r.getInt(1), r.getDouble(2)))
        .toSeq
    }

    // Widening loop. Because the filter can empty out any cell, count-based
    // sizing is a heuristic only; correctness comes from the bound check.
    var scanned = 0
    var acc: Seq[Neighbor] = Seq.empty
    var done = false
    while (!done && scanned < ranked.length) {
      // Each round is a full Spark job (scan + top-k + collect), so round
      // count dominates latency. First round: take cells covering ≥ 8k rows
      // (filters and boundary effects make exactly-k too optimistic — one
      // extra cell is far cheaper than another round). Later rounds: double
      // the scanned prefix, so total rounds stay O(log cells).
      var take = scanned
      var cum = 0L
      val target = math.max(8L * k, 1L)
      while (take < ranked.length && (cum < target || take < math.max(scanned * 2, scanned + 1))) {
        cum += ranked(take)._3
        take += 1
      }
      acc = scanCells(ranked.take(take).map(_._1).toSeq)
      scanned = take
      val kth = if (acc.size >= k) acc.last.dist else Double.PositiveInfinity
      done = scanned >= ranked.length || ranked(scanned)._2 > kth
    }
    acc
  }

  /** Radius (range) search — the other half of a vector-DB read API next
    * to top-k: every row within distance `r`, ordered `(dist ASC, id ASC)`.
    * Same plan shape as [[bruteForce]] minus the limit; the distance
    * predicate evaluates inside the scan's codegen stage, so at 100 TB it
    * is a single filtered scan with no shuffle. */
  def radiusSearch(
      db: DataFrame,
      distExpr: Column,
      r: Double,
      idCol: String = "vec_id",
      pred: Option[Column] = None,
      keep: Seq[String] = Seq("vec_id", "label")): DataFrame = {
    val filtered = pred.map(db.filter).getOrElse(db)
    filtered
      .withColumn("dist", distExpr)
      .filter(col("dist") <= lit(r))
      .select((keep.map(col) :+ col("dist")): _*)
      .orderBy(col("dist").asc, col(idCol).asc)
  }

  /** Cell-pruned radius search: unlike kNN, the pruning set is KNOWN up
    * front — exactly the cells whose closed-form lower bound is ≤ r — so
    * there is no widening loop, just one scan over the candidate cells
    * (partition pruning on a cell-partitioned store). Exact: a cell with
    * bound > r cannot contain a point within r. */
  def prunedRadius(
      indexed: DataFrame,
      cfg: GridConfig,
      q: Array[Double],
      r: Double,
      pred: Option[Column] = None,
      cellBound: (Array[Double], Long, GridConfig) => Double = Grid.cellLowerBoundSqL2,
      distExpr: Option[Column] = None): DataFrame = {
    val cells = indexed.select(col("cell_id")).distinct().collect()
      .map(_.getAs[Number](0).longValue())
      .filter(cell => cellBound(q, cell, cfg) <= r)
    val dist = distExpr.getOrElse(Distances.squaredL2Lit(col("embedding"), q))
    val base =
      if (cells.isEmpty) indexed.filter(lit(false))
      else indexed.filter(col("cell_id").isin(cells.toSeq: _*))
    val filtered = pred.map(base.filter).getOrElse(base)
    filtered
      .withColumn("dist", dist)
      .filter(col("dist") <= lit(r))
      .select(col("vec_id"), col("label"), col("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
  }

  /** DataFrame wrapper around [[prunedSearch]] for the driver contract. */
  def prunedSearchDf(
      spark: SparkSession,
      indexed: DataFrame,
      cfg: GridConfig,
      q: Array[Double],
      k: Int,
      pred: Option[Column] = None,
      bruteForceThreshold: Long = 200000L): DataFrame = {
    import spark.implicits._
    val rows = prunedSearch(indexed, cfg, q, k, pred,
      bruteForceThreshold = bruteForceThreshold)
    spark.createDataset(rows).toDF()
  }
}
