package graft

import graft.api.{L1, SquaredL2, VectorDatabase}
import graft.core.{Fixtures, Tables}
import org.apache.spark.sql.functions._

/** The reference VectorDatabase contract exercised through the typed facade
  * (reference: vectordb/database.py:18-64, tests/test_kd_tree_database.py). */
class ApiSpec extends SparkSpecBase {
  import Fixtures._

  private lazy val db = VectorDatabase.fromDataFrame(
    spark, Tables.embeddings(spark, sfDir), SparkEntry.gridCfg)

  test("dim / count / treeDepth accessors") {
    assert(db.dim === 64)
    assert(db.count() === 500)
    assert(db.treeDepth === 3)
  }

  test("insert assigns fresh monotonic ids; old snapshot unchanged") {
    val rows = Tables.embeddings(spark, sfDir).limit(3).drop("vec_id")
    val (db2, ids) = db.insert(rows)
    assert(db2.count() === 503)
    assert(db.count() === 500)
    val assigned = ids.collect().map(_.getLong(0)).sorted
    assert(assigned.toSeq === Seq(500L, 501L, 502L)) // maxId 499 → next 500
  }

  test("getEntry finds a row; missing id is None (kd_tree_database.py:272-276)") {
    assert(db.getEntry(42L).isDefined)
    assert(db.getEntry(999999L).isEmpty)
  }

  test("delete removes; kNN no longer finds it") {
    val row = db.getEntry(7L).get
    val q = row.getSeq[Float](row.fieldIndex("embedding")).map(_.toDouble).toArray
    val before = db.findKNearestNeighbors(q, 1)
    assert(before.head.vec_id === 7L && before.head.dist === 0.0)
    val db2 = db.delete(Seq(7L))
    assert(db2.count() === 499)
    val after = db2.findKNearestNeighbors(q, 1)
    assert(after.head.vec_id !== 7L)
  }

  test("updatePosition moves a vector to a new cell and kNN finds it there") {
    val updates = db.state.filter(col("vec_id") === 11)
      .drop("cell_id")
      .withColumn("embedding", array((0 until 64).map(_ => lit(0.55f)): _*))
    val db2 = db.updatePosition(updates)
    val res = db2.findKNearestNeighbors(Array.fill(64)(0.55), 1)
    assert(res.head.vec_id === 11L)
    assert(res.head.dist < 1e-10)
  }

  test("updatePosition RAISES on an unknown id (reference contract, kd_tree_database.py:313-315)") {
    val ghost = db.state.filter(col("vec_id") === 11)
      .drop("cell_id")
      .withColumn("vec_id", lit(987654321L))
    val ex = intercept[Exception] { db.updatePosition(ghost).count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("unknown vec_id")),
      s"unexpected failure: ${ex.getMessage}")
    // lenient operator form still no-ops for pipelines
    val lenient = graft.operators.Snapshot.updatePosition(
      db.state.drop("cell_id"), ghost, "vec_id", "embedding", strict = false)
    assert(lenient.count() === 500)
  }

  test("findKNearestNeighbors accepts an ARBITRARY-callable filter (Scala UDF escape hatch)") {
    // the reference's filter is Callable[[T], bool] (vectordb/database.py:
    // 40-44); any JVM predicate rides a Scala UDF Column through the same
    // filter-before-k path
    val oddLabel = udf((l: Int) => l % 2 == 1)
    val res = db.findKNearestNeighbors(Q64, 5, filter = Some(oddLabel(col("label"))))
    assert(res.size === 5)
    val brute = graft.operators.Knn.bruteForce(db.scan(),
      graft.functions.Distances.squaredL2Lit(col("embedding"), Q64), 5,
      pred = Some(oddLabel(col("label"))))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(res.map(n => (n.vec_id, n.dist)) === brute)
    assert(res.forall(_ => true))
    // the callable gated candidacy BEFORE k, not the top-k after
    val labels = db.scan().filter(col("vec_id").isin(res.map(_.vec_id): _*))
      .select("label").collect().map(_.getInt(0))
    assert(labels.forall(_ % 2 == 1))
  }

  test("findKNearestNeighbors honors filter and non-default metric") {
    val res = db.findKNearestNeighbors(Q64, 5, filter = Some(col("label") === 2),
      metric = Some(L1))
    assert(res.size === 5)
    assert(res.forall(_.label === 2))
    // matches brute force under L1
    val brute = operators.Knn.bruteForce(db.scan(),
      functions.Distances.l1Lit(col("embedding"), Q64), 5, pred = Some(col("label") === 2))
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(res.map(n => (n.vec_id, n.dist)) === brute)
  }

  test("MahalanobisFull facade metric: matches brute force; pruned path is admissible") {
    import graft.api.MahalanobisFull
    import graft.index.GridConfig
    val cfg8 = GridConfig(dim = 8, lower = -0.6, upper = 0.6, partsPerDim = 4, gridDims = 3)
    val Q8 = Q64.take(8)
    val e8 = Tables.embeddings(spark, sfDir)
      .withColumn("embedding", slice(col("embedding"), lit(1), lit(8)))
      .select(col("vec_id"), col("embedding"), col("label"))
    val m = MahalanobisFull(InvFull8, 8)
    val db8 = VectorDatabase.fromDataFrame(spark, e8, cfg8, metric = m)
    val res = db8.findKNearestNeighbors(Q8, 10)
    val brute = operators.Knn.bruteForce(e8,
      functions.Distances.mahalanobisFullLit(col("embedding"), Q8, InvFull8), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(res.map(n => (n.vec_id, n.dist)) === brute)
    // widening-loop path (bruteForceThreshold = 0): the Gershgorin·sqL2
    // cell bound must be admissible — pruned ≡ brute exactly
    val pruned = operators.Knn.prunedSearch(db8.state, cfg8, Q8, 10,
      cellBound = m.cellBound, distExpr = Some(m.dist(col("embedding"), Q8)),
      bruteForceThreshold = 0L)
    assert(pruned.map(n => (n.vec_id, n.dist)) === brute)
    // the bound itself never exceeds the true distance for any stored row
    val bounds = db8.state.select(col("cell_id"),
        m.dist(col("embedding"), Q8).as("dist")).collect()
    bounds.foreach { r =>
      val b = m.cellBound(Q8, r.getAs[Number](0).longValue(), cfg8)
      assert(b <= r.getDouble(1) + 1e-9,
        s"inadmissible bound $b > ${r.getDouble(1)} for cell ${r.get(0)}")
    }
  }

  test("MahalanobisFull.fromCovariance factorizes once and round-trips the inverse") {
    import graft.api.MahalanobisFull
    // S = A'A + I (SPD); fromCovariance(S) must reproduce inv(S) so that
    // d'S⁻¹d of the facade == the solve-per-pair reference semantics
    val n = 4
    val rnd = new scala.util.Random(5)
    val a = Array.fill(n, n)(rnd.nextGaussian() * 0.3)
    val s = Array.tabulate(n * n) { k =>
      val (i, j) = (k / n, k % n)
      (0 until n).map(t => a(t)(i) * a(t)(j)).sum + (if (i == j) 1.0 else 0.0)
    }
    val m = MahalanobisFull.fromCovariance(s, n)
    // inv(S)·S ≈ I
    for (i <- 0 until n; j <- 0 until n) {
      val prod = (0 until n).map(t => m.invFlat(i * n + t) * s(t * n + j)).sum
      assert(math.abs(prod - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j) -> $prod")
    }
  }

  test("Grid.maintain deepens the grid when cells overflow (leaf-split analog)") {
    import graft.index.{Grid, GridConfig}
    val cfg1 = SparkEntry.gridCfg.copy(gridDims = 1)
    val state = Grid.withCellId(Tables.embeddings(spark, sfDir), "embedding", cfg1)
    // 500 rows, target 10/cell: 4 cells at depth 1 can't hold it → deepen
    val (state2, cfg2) = Grid.maintain(state, cfg1, targetLeafSize = 10)
    assert(cfg2.gridDims > cfg1.gridDims)
    // invariant: re-bucketing moves rows between cells, never loses them
    assert(state2.count() == 500)
    assert(state2.groupBy("cell_id").count().agg(sum("count")).head().getLong(0) == 500)
    // cell ids are consistent with the new config
    val recomputed = state2.filter(
      col("cell_id") =!= Grid.cellId(col("embedding"), cfg2)).count()
    assert(recomputed == 0)
    // and a sufficient grid is a no-op
    val (state3, cfg3) = Grid.maintain(state2, cfg2, targetLeafSize = 10)
    assert(cfg3 == cfg2 && (state3 eq state2))
  }

  test("Grid.maintain narrows buckets once depth hits dim (low-dim re-split analog)") {
    import graft.index.{Grid, GridConfig}
    import spark.implicits._
    // dim=2 data, like the reference's own tests: depth can never exceed 2,
    // so the only way to keep leaves bounded is narrower buckets — the
    // reference re-splits the same dimension forever (kd_tree_database.py
    // split dim cycles depth % dim); configFor widens partsPerDim instead
    val cfg1 = GridConfig(dim = 2, lower = 0.0, upper = 1.0, partsPerDim = 2, gridDims = 2)
    val rows = (0 until 4096).map { i =>
      (i.toLong, Array(((i * 2654435761L) % 1000L).toFloat / 1000f,
        ((i * 40503L) % 997L).toFloat / 997f))
    }.toDF("vec_id", "embedding")
    val state = Grid.withCellId(rows, "embedding", cfg1)
    val (state2, cfg2) = Grid.maintain(state, cfg1, targetLeafSize = 16)
    assert(cfg2.gridDims == 2, "depth stays clamped at dim")
    assert(cfg2.partsPerDim > cfg1.partsPerDim,
      s"partsPerDim must widen: ${cfg2.partsPerDim}")
    assert(cfg2.numCells >= 4096 / 16, s"cells ${cfg2.numCells} too few")
    // re-bucketing is lossless and consistent with the widened config
    assert(state2.count() == 4096)
    assert(state2.filter(
      col("cell_id") =!= Grid.cellId(col("embedding"), cfg2)).count() == 0)
    // the uniform-ish fixture must land well under the old single-cell pileup
    val maxLeaf = state2.groupBy("cell_id").count()
      .agg(max("count")).head().getLong(0)
    assert(maxLeaf <= 16 * 8, s"max leaf $maxLeaf not bounded")
    // pruned-search admissibility is geometry-independent: the cell lower
    // bound never exceeds the true distance under the widened config
    val q = Array(0.31, 0.77)
    state2.select(col("vec_id"), col("cell_id"), col("embedding")).collect().foreach { r =>
      val v = r.getSeq[Float](2).map(_.toDouble).toArray
      val d = graft.functions.Distances.squaredL2(q, v)
      val lb = Grid.cellLowerBoundSqL2(q, r.getLong(1), cfg2)
      assert(lb <= d + 1e-12, s"bound $lb exceeds true dist $d")
    }
  }

  test("zCellId rejects configs whose interleaved bits overflow Long") {
    import graft.index.{Grid, GridConfig}
    // 256 parts x 8 dims = 64 bits: the top term would wrap into the sign
    // bit and collide — must be rejected up front, in both emitters
    val bad = GridConfig(dim = 8, lower = 0.0, upper = 1.0, partsPerDim = 256, gridDims = 8)
    intercept[IllegalArgumentException] { Grid.zCellId(col("embedding"), bad) }
    intercept[IllegalArgumentException] { Grid.zCellIdSql("embedding", bad) }
    // 63 bits is the maximum legal width
    val ok = bad.copy(dim = 9, partsPerDim = 128, gridDims = 9) // 7*9 = 63
    Grid.zCellId(col("embedding"), ok); Grid.zCellIdSql("embedding", ok)
  }

  test("save/load round-trips through cell-partitioned parquet") {
    val path = java.nio.file.Files.createTempDirectory("graftdb").toString + "/store"
    db.save(path)
    val db2 = VectorDatabase.load(spark, path, SparkEntry.gridCfg)
    assert(db2.count() === db.count())
    val res = db2.findKNearestNeighbors(Q64, 3)
    val orig = db.findKNearestNeighbors(Q64, 3)
    assert(res.map(_.vec_id) === orig.map(_.vec_id))
  }

  test("radiusSearch returns exactly the rows within r, k-th-neighbor-consistent") {
    // anchor r on the 5th neighbor's distance: the radius result must then
    // contain at least those 5 and every returned dist must be <= r
    val nn = db.findKNearestNeighbors(Q64, 5)
    val r = nn.last.dist
    val rows = db.radiusSearch(Q64, r)
      .select("vec_id", "dist").collect()
      .map(x => x.getLong(0) -> x.getDouble(1))
    assert(rows.forall(_._2 <= r))
    assert(nn.map(_.vec_id).toSet.subsetOf(rows.map(_._1).toSet))
    // sorted (dist, id)
    assert(rows.sortBy(p => (p._2, p._1)).toSeq == rows.toSeq)
  }
}
