package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Grid index configuration — the Spark re-expression of the reference's
  * KD-tree tuning knobs (reference: vectordb/kd_tree_database.py:12-16,
  * 234-249: dim, lower_bound, upper_bound, num_splits_per_dimension,
  * max_leaf_size).
  *
  * The reference splits one dimension per tree level into
  * `num_splits_per_dimension + 1` equal-width parts, cycling dimensions with
  * depth (kd_tree_database.py:19-22, 59-70). For depth ≤ dim that is exactly
  * a flat equal-width grid over the first `gridDims` dimensions — which is
  * what we build: a deterministic `cell_id` COLUMN instead of a driver-side
  * tree, so candidate-cell pruning becomes partition pruning / an `isin`
  * filter that Catalyst pushes to the parquet scan. At 100 TB the indexed
  * table is written `partitionBy("cell_id")` so pruning skips whole files.
  *
  * @param partsPerDim buckets per gridded dimension (= reference
  *                    num_splits_per_dimension + 1)
  * @param gridDims    number of leading dimensions that are gridded (= tree
  *                    depth; the reference grows depth on leaf overflow — we
  *                    pick it from the row count, see [[Grid.depthFor]])
  */
final case class GridConfig(
    dim: Int,
    lower: Double = -1.0,
    upper: Double = 1.0,
    partsPerDim: Int = 4,
    gridDims: Int = 3) {
  require(partsPerDim >= 2, "need at least 2 buckets per dim")
  require(gridDims >= 1 && gridDims <= dim, "gridDims must be in [1, dim]")
  val numCells: Long = math.pow(partsPerDim.toDouble, gridDims.toDouble).toLong
  /** Bucket edges for gridded dim d: lower + j*width, j=0..partsPerDim. */
  val width: Double = (upper - lower) / partsPerDim
  /** Stable geometry fingerprint — stamped into the `cell_id` column's
    * metadata by [[Grid.withCellId]] and used by the pruning rule to bind
    * a cell_id column to the EXACT grid that produced it (a same-dim
    * column built under a different geometry must never be pruned with
    * this config's bounds). */
  lazy val fingerprint: String = {
    val canonical = s"$dim,$lower,$upper,$partsPerDim,$gridDims"
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
  }
}

object Grid {

  /** Rows-per-cell-targeting depth pick: the batch analog of the reference's
    * leaf-overflow splitting (kd_tree_database.py:98-102). */
  def depthFor(rowCount: Long, targetLeafSize: Long, partsPerDim: Int, dim: Int): Int = {
    val cellsNeeded = math.max(1L, rowCount / math.max(1L, targetLeafSize))
    val d = math.ceil(math.log(cellsNeeded.toDouble) / math.log(partsPerDim.toDouble)).toInt
    math.min(math.max(1, d), dim)
  }

  /** Bucket index of one gridded dimension, as a Column. Mirrors the
    * reference's floor formula with both-end clamping
    * (kd_tree_database.py:59-70 clamps only the ==upper edge; we clamp both
    * so out-of-bounds vectors land in edge cells instead of breaking —
    * SURVEY.md §7 "out-of-bounds vectors" trap). Exact same arithmetic is
    * emitted for the DuckDB oracle by [[bucketSql]]. */
  def bucket(v: Column, dimIdx: Int, cfg: GridConfig): Column =
    least(
      lit(cfg.partsPerDim - 1L),
      greatest(
        lit(0L),
        floor(((element_at(v, dimIdx + 1).cast(DoubleType) - lit(cfg.lower)) / lit(cfg.upper - cfg.lower)) * lit(cfg.partsPerDim.toDouble))
      )
    ).cast(IntegerType)

  def bucketSql(col: String, dimIdx: Int, cfg: GridConfig): String = {
    import graft.oracle.DuckSql.fmt
    s"CAST(LEAST(${cfg.partsPerDim - 1}, GREATEST(0, FLOOR(((CAST($col[${dimIdx + 1}] AS DOUBLE) - (${fmt(cfg.lower)})) / (${fmt(cfg.upper - cfg.lower)})) * (${fmt(cfg.partsPerDim.toDouble)})))) AS INT)"
  }

  /** cell_id = Σ bucket_d * partsPerDim^d over the gridded dims (integer
    * math — association-safe). */
  def cellId(v: Column, cfg: GridConfig): Column = {
    val terms = (0 until cfg.gridDims).map { d =>
      val p = math.pow(cfg.partsPerDim.toDouble, d.toDouble).toLong
      bucket(v, d, cfg).cast(LongType) * lit(p)
    }
    terms.reduce(_ + _)
  }

  def cellIdSql(col: String, cfg: GridConfig): String =
    (0 until cfg.gridDims).map { d =>
      val p = math.pow(cfg.partsPerDim.toDouble, d.toDouble).toLong
      s"(CAST(${bucketSql(col, d, cfg)} AS BIGINT) * $p)"
    }.mkString("(", " + ", ")")

  /** Add the cell_id column, stamped with the geometry fingerprint in its
    * metadata so [[graft.plans.GridRadiusPruning]] can bind the column to
    * the exact grid that produced it (metadata survives projections;
    * parquet PARTITION columns lose it — bind those stores by path via
    * `GridRadiusPruning.register(spark, cfg, storePath)`). For a
    * persisted index at scale, follow with
    * `.repartition(col("cell_id")).write.partitionBy("cell_id")` so reads
    * get file-level pruning. */
  def withCellId(df: DataFrame, vecCol: String, cfg: GridConfig): DataFrame = {
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("graft.grid.fp", cfg.fingerprint).build()
    df.withColumn("cell_id", cellId(col(vecCol), cfg).as("cell_id", md))
  }

  /** Z-order (Morton) cell id: same bucket tuple as [[cellId]], but with the
    * per-dimension bucket BITS interleaved, so cells that are close in space
    * get close ids. That is the property a 100 TB store layout wants:
    * writing the index sorted by z-cell (`repartitionByRange` + local sort)
    * clusters spatial neighborhoods into the same files, and a candidate
    * cell box from the kNN pruner becomes a SMALL SET OF CONTIGUOUS id
    * ranges → parquet row-group min/max skipping, where the row-major
    * [[cellId]] would scatter one box across strided ids. Pure non-negative
    * integer math (shift + mod), emitted identically for DuckDB by
    * [[zCellIdSql]]. Requires power-of-two partsPerDim. */
  def zCellId(v: Column, cfg: GridConfig): Column = {
    val bits = java.lang.Integer.numberOfTrailingZeros(cfg.partsPerDim)
    require((1 << bits) == cfg.partsPerDim, "z-order needs power-of-two partsPerDim")
    require(bits * cfg.gridDims <= 63,
      s"z-order id needs ${bits * cfg.gridDims} bits (> 63): " +
        s"partsPerDim=${cfg.partsPerDim} x gridDims=${cfg.gridDims} overflows Long")
    val terms = for (d <- 0 until cfg.gridDims; b <- 0 until bits) yield
      (shiftright(bucket(v, d, cfg), b).cast(LongType) % lit(2L)) *
        lit(1L << (b * cfg.gridDims + d))
    terms.reduce(_ + _)
  }

  def zCellIdSql(col: String, cfg: GridConfig): String = {
    val bits = java.lang.Integer.numberOfTrailingZeros(cfg.partsPerDim)
    require((1 << bits) == cfg.partsPerDim, "z-order needs power-of-two partsPerDim")
    require(bits * cfg.gridDims <= 63,
      s"z-order id needs ${bits * cfg.gridDims} bits (> 63): " +
        s"partsPerDim=${cfg.partsPerDim} x gridDims=${cfg.gridDims} overflows Long")
    (for (d <- 0 until cfg.gridDims; b <- 0 until bits) yield
      s"(((CAST(${bucketSql(col, d, cfg)} AS BIGINT) // ${1L << b}) % 2) * ${1L << (b * cfg.gridDims + d)})"
    ).mkString("(", " + ", ")")
  }

  /** Target config for a corpus size: deepen the grid while depth < dim;
    * once every dimension is gridded, WIDEN partsPerDim instead — the
    * batch analog of the reference re-splitting the same dimension with
    * narrower buckets (its split dim cycles `depth % dim` forever,
    * kd_tree_database.py:19-22, so leaf size stays bounded at any corpus
    * size even for dim=2 data; the r5 clamp at `gridDims ≤ dim` let
    * low-dim cells grow linearly with the corpus instead). Cell count
    * stays ≥ rows/targetLeafSize either way. */
  def configFor(rowCount: Long, targetLeafSize: Long, cfg: GridConfig): GridConfig = {
    val cellsNeeded = math.max(1L, rowCount / math.max(1L, targetLeafSize))
    val depth = depthFor(rowCount, targetLeafSize, cfg.partsPerDim, cfg.dim)
    if (math.pow(cfg.partsPerDim.toDouble, depth.toDouble) >= cellsNeeded)
      cfg.copy(gridDims = math.max(cfg.gridDims, depth))
    else {
      // fully gridded at the current width still overflows: narrow the
      // buckets so partsPerDim'^dim ≥ cellsNeeded
      val p = math.ceil(math.pow(cellsNeeded.toDouble, 1.0 / cfg.dim)).toInt
      cfg.copy(gridDims = cfg.dim, partsPerDim = math.max(cfg.partsPerDim, p))
    }
  }

  /** Batch analog of the reference's leaf-overflow split
    * (kd_tree_database.py:98-102: a leaf exceeding max_leaf_size
    * redistributes into children one level deeper): when the row count
    * calls for a deeper OR finer grid than the state was bucketed with
    * ([[configFor]]), re-bucket every row in one pass and return the
    * widened config. No-op (same state, same cfg) while the current
    * geometry suffices — call it after large insert batches. At 100 TB
    * the rewrite is one repartition-by-cell job, amortized over the batch
    * that tripped it. */
  def maintain(state: DataFrame, cfg: GridConfig, targetLeafSize: Long,
      vecCol: String = "embedding"): (DataFrame, GridConfig) = {
    val n = state.count()
    val cfg2 = configFor(n, targetLeafSize, cfg)
    if (cfg2 == cfg) (state, cfg)
    else (state.withColumn("cell_id", cellId(col(vecCol), cfg2)), cfg2)
  }

  /** Runtime dimension validation on ingest (the reference asserts vector
    * shape on insert, kd_tree_database.py:84-85). Implemented as a FILTER
    * whose predicate raises on a wrong-sized or null vector — a filter
    * cannot be pruned away like an unused check column would be;
    * `assert_true` returns null on success so the predicate is always
    * true for valid rows. */
  def requireDim(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.filter(coalesce(
      assert_true(col(vecCol).isNotNull && size(col(vecCol)) === dim,
        lit(s"ingest validation: $vecCol must be a non-null vector of dim $dim")),
      lit(true)))

  // ---- driver-side math (candidate-cell ranking for pruned search) ----

  def bucketOf(x: Double, cfg: GridConfig): Int = {
    val b = math.floor(((x - cfg.lower) / (cfg.upper - cfg.lower)) * cfg.partsPerDim).toLong
    math.min(cfg.partsPerDim - 1L, math.max(0L, b)).toInt
  }

  /** Driver-side cell id of a vector — same math as the [[cellId]] Column. */
  def cellOf(v: Array[Double], cfg: GridConfig): Long = {
    var c = 0L
    var d = 0
    var p = 1L
    while (d < cfg.gridDims) {
      c += bucketOf(v(d), cfg).toLong * p
      p *= cfg.partsPerDim
      d += 1
    }
    c
  }

  /** Decode cell id back into per-dim bucket indices. */
  def decode(cellId: Long, cfg: GridConfig): Array[Int] = {
    val out = new Array[Int](cfg.gridDims)
    var rest = cellId
    var d = 0
    while (d < cfg.gridDims) {
      out(d) = (rest % cfg.partsPerDim).toInt
      rest /= cfg.partsPerDim
      d += 1
    }
    out
  }

  /** Exact squared-L2 lower bound from query point q to any point inside the
    * cell — per-dim distance to the bucket interval, summed over gridded
    * dims. This is tighter than the reference's single-plane bound
    * (kd_tree_database.py:164-181) and still a valid lower bound, so the
    * widening loop terminates with the exact answer. Ungridded dims
    * contribute 0 (conservative). */
  def cellLowerBoundSqL2(q: Array[Double], cell: Long, cfg: GridConfig): Double = {
    val b = decode(cell, cfg)
    var s = 0.0
    var d = 0
    while (d < cfg.gridDims) {
      val lo = cfg.lower + b(d) * cfg.width
      val hi = lo + cfg.width
      val x = q(d)
      // Edge cells absorb out-of-bounds mass (bucket() clamps), so their
      // interval extends to infinity on the clamped side: no bound there.
      val below = if (b(d) == 0) Double.NegativeInfinity else lo
      val above = if (b(d) == cfg.partsPerDim - 1) Double.PositiveInfinity else hi
      val gap = if (x < below) below - x else if (x > above) x - above else 0.0
      s += gap * gap
      d += 1
    }
    s
  }

  /** L1 lower bound: sum of per-dim gaps. */
  def cellLowerBoundL1(q: Array[Double], cell: Long, cfg: GridConfig): Double = {
    val b = decode(cell, cfg)
    var s = 0.0
    var d = 0
    while (d < cfg.gridDims) {
      val lo = cfg.lower + b(d) * cfg.width
      val hi = lo + cfg.width
      val below = if (b(d) == 0) Double.NegativeInfinity else lo
      val above = if (b(d) == cfg.partsPerDim - 1) Double.PositiveInfinity else hi
      val x = q(d)
      val gap = if (x < below) below - x else if (x > above) x - above else 0.0
      s += gap
      d += 1
    }
    s
  }

  /** L∞ lower bound: max per-dim gap. */
  def cellLowerBoundLInf(q: Array[Double], cell: Long, cfg: GridConfig): Double = {
    val b = decode(cell, cfg)
    var m = 0.0
    var d = 0
    while (d < cfg.gridDims) {
      val lo = cfg.lower + b(d) * cfg.width
      val hi = lo + cfg.width
      val below = if (b(d) == 0) Double.NegativeInfinity else lo
      val above = if (b(d) == cfg.partsPerDim - 1) Double.PositiveInfinity else hi
      val x = q(d)
      val gap = if (x < below) below - x else if (x > above) x - above else 0.0
      if (gap > m) m = gap
      d += 1
    }
    m
  }

  /** Mahalanobis-diagonal lower bound: weighted per-dim gaps. */
  def cellLowerBoundMahalanobisDiag(q: Array[Double], cell: Long, cfg: GridConfig, invDiag: Array[Double]): Double = {
    val b = decode(cell, cfg)
    var s = 0.0
    var d = 0
    while (d < cfg.gridDims) {
      val lo = cfg.lower + b(d) * cfg.width
      val hi = lo + cfg.width
      val below = if (b(d) == 0) Double.NegativeInfinity else lo
      val above = if (b(d) == cfg.partsPerDim - 1) Double.PositiveInfinity else hi
      val x = q(d)
      val gap = if (x < below) below - x else if (x > above) x - above else 0.0
      s += gap * gap * invDiag(d)
      d += 1
    }
    s
  }
}
