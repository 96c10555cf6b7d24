package graft

import graft.functions.Distances
import graft.index.{Grid, GridConfig, QuantileGrid}
import graft.plans.{GridRadiusPruning, QuantileGridRadiusPruning}
import org.apache.spark.sql.functions._

/** Automatic radius pruning over QUANTILE-calibrated stores: the sibling
  * rule must inject an admissible cell list from the interval bounds,
  * reach the scan as a partition filter, never bind a foreign geometry,
  * and compose with the equal-width rule in one optimizer batch. */
class QuantileGridPruneRuleSpec extends SparkSpecBase {
  import spark.implicits._

  // skewed 2-D data (exponential-ish toward 0) — the regime the quantile
  // grid exists for; 8x8 = 64 cells, query near the dense corner
  private lazy val pts = {
    val rnd = new scala.util.Random(42)
    (0 until 500).map { i =>
      (i.toLong, Array(
        math.min(1.0, -math.log(rnd.nextDouble()) / 5.0).toFloat,
        math.min(1.0, -math.log(rnd.nextDouble()) / 5.0).toFloat))
    }
  }
  private lazy val df = pts.toDF("vec_id", "embedding")
  private lazy val qcfg =
    QuantileGrid.calibrate(df, "embedding", partsPerDim = 8, gridDims = 2, dim = 2)
  private lazy val store = {
    val p = java.nio.file.Files.createTempDirectory("graft_qprune_rule").toString
    QuantileGrid.withCellId(df, "embedding", qcfg)
      .write.mode("overwrite").partitionBy("cell_id").parquet(p)
    p
  }
  private val q = Array(0.05, 0.05)
  private val r = 0.01

  private def clearRegistries(): Unit = {
    spark.conf.unset(QuantileGridRadiusPruning.ConfKey)
    spark.conf.unset(GridRadiusPruning.ConfKey)
  }

  test("radius filter over a quantile store auto-gains cell pruning; result identical to plain") {
    clearRegistries()
    QuantileGridRadiusPruning.register(spark, qcfg, store)
    val indexed = spark.read.parquet(store)
    val dist = Distances.squaredL2Lit(col("embedding"), q)
    val pruned = indexed.filter(dist <= lit(r)).select("vec_id")
    val opt = pruned.queryExecution.optimizedPlan.toString
    assert(opt.contains("cell_id") && opt.contains(" IN "),
      s"no pruning conjunct injected:\n$opt")
    val phys = pruned.queryExecution.executedPlan.toString
    assert(phys.contains("PartitionFilters") &&
      phys.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("cell_id"),
      s"pruning did not reach the scan:\n$phys")
    val got = pruned.collect().map(_.getLong(0)).sorted.toSeq
    spark.conf.unset(QuantileGridRadiusPruning.ConfKey)
    val plain = indexed.filter(dist <= lit(r)).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == plain && got.nonEmpty)
  }

  test("all four reference metrics prune admissibly (≡ brute membership) on the quantile geometry") {
    clearRegistries()
    QuantileGridRadiusPruning.register(spark, qcfg, store)
    val indexed = spark.read.parquet(store)
    val w = Array(2.0, 0.5)
    val cases: Seq[(org.apache.spark.sql.Column, Array[Float] => Double, Double)] = Seq(
      (Distances.squaredL2Lit(col("embedding"), q),
        v => { val a = v(0) - q(0); val b = v(1) - q(1); a * a + b * b }, 0.01),
      (Distances.l1Lit(col("embedding"), q),
        v => math.abs(v(0) - q(0)) + math.abs(v(1) - q(1)), 0.12),
      (Distances.lInfLit(col("embedding"), q),
        v => math.max(math.abs(v(0) - q(0)), math.abs(v(1) - q(1))), 0.09),
      (Distances.mahalanobisDiagLit(col("embedding"), q, w),
        v => { val a = v(0) - q(0); val b = v(1) - q(1); a * a * w(0) + b * b * w(1) }, 0.02))
    cases.zipWithIndex.foreach { case ((distCol, distFn, rad), i) =>
      val got = indexed.filter(distCol <= lit(rad))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val expect = pts.filter { case (_, v) => distFn(v) <= rad }.map(_._1).toSet
      assert(got == expect, s"metric case $i: got ${got.size}, expect ${expect.size}")
      assert(expect.nonEmpty, s"metric case $i vacuous")
    }
  }

  /** Flat (non-partitioned) store: cell_id stays a DATA column, so the
    * fingerprint metadata survives the parquet footer — the same binding
    * path GridPruneRuleSpec exercises (a LocalRelation would be constant-
    * folded before the rule could fire). */
  private def flatStore(cfg: graft.index.QuantileGridConfig): String = {
    val p = java.nio.file.Files.createTempDirectory("graft_qprune_md").toString
    QuantileGrid.withCellId(df, "embedding", cfg)
      .write.mode("overwrite").parquet(p)
    p
  }

  test("quantile rule refuses a foreign fingerprint; equal-width rule never binds a quantile column") {
    clearRegistries()
    // register a DIFFERENT quantile geometry (other boundaries) — the
    // fingerprinted column must refuse to prune
    val foreign = qcfg.copy(boundaries = qcfg.boundaries.map(_.map(_ + 0.123)))
    QuantileGridRadiusPruning.register(spark, foreign)
    // also register an equal-width config of the same dim on ITS registry:
    // disjoint metadata keys mean it can never see this column either
    GridRadiusPruning.register(spark,
      GridConfig(dim = 2, lower = 0.0, upper = 1.0, partsPerDim = 8, gridDims = 2))
    val dist = Distances.squaredL2Lit(col("embedding"), q)
    val opt = spark.read.parquet(flatStore(qcfg)).filter(dist <= lit(r))
      .queryExecution.optimizedPlan.toString
    assert(!opt.matches("(?s).*cell_id#\\d+L? IN.*"),
      s"foreign geometry pruned a column it must refuse:\n$opt")
    clearRegistries()
  }

  test("matching fingerprint prunes the stored column; both rules coexist at fixed point") {
    clearRegistries()
    QuantileGridRadiusPruning.register(spark, qcfg)
    GridRadiusPruning.register(spark,
      GridConfig(dim = 2, lower = 0.0, upper = 1.0, partsPerDim = 8, gridDims = 2))
    val dist = Distances.squaredL2Lit(col("embedding"), q)
    val stored = spark.read.parquet(flatStore(qcfg))
    val pruned = stored.filter(dist <= lit(r)).select("vec_id")
    val opt = pruned.queryExecution.optimizedPlan.toString
    // exactly one IN injected (the cell_id-reference guard stops a second)
    assert(opt.matches("(?s).*cell_id#\\d+L? IN.*"),
      s"fingerprinted column did not prune:\n$opt")
    assert(" IN ".r.findAllIn(opt).size == 1, s"double injection:\n$opt")
    val got = pruned.collect().map(_.getLong(0)).sorted.toSeq
    clearRegistries()
    val plain = stored.filter(dist <= lit(r)).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == plain && got.nonEmpty)
  }

  test("declared store_autoprune_radius_quantile equals the plain radius answer") {
    clearRegistries()
    val out = SparkEntry.queries("store_autoprune_radius_quantile")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val plainQ = graft.core.Fixtures.Q64.take(2)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), slice(col("embedding"), 1, 2).as("embedding"))
    val plain = emb
      .withColumn("dist", Distances.squaredL2Lit(col("embedding"), plainQ))
      .filter(col("dist") <= 0.01)
      .select(col("vec_id"), col("dist"))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == plain.toSeq && out.nonEmpty)
    clearRegistries()
  }

  test("over-cap geometry (numCells > MaxEnumCells) degrades to no pruning, result unchanged") {
    clearRegistries()
    // 1025² ≈ 1.05M cells — past the driver-enumeration cap: optimizing a
    // query must NOT walk a million cells per pass; the rule skips and the
    // plain filter answers (always-correct degradation)
    val edges = (1 to 1024).map(_ / 1025.0)
    val hugeCfg = graft.index.QuantileGridConfig(2, Seq(edges, edges))
    assert(hugeCfg.numCells > GridRadiusPruning.MaxEnumCells)
    QuantileGridRadiusPruning.register(spark, hugeCfg, store)
    val indexed = spark.read.parquet(store)
    val dist = Distances.squaredL2Lit(col("embedding"), q)
    val pruned = indexed.filter(dist <= lit(r)).select("vec_id")
    val opt = pruned.queryExecution.optimizedPlan.toString
    assert(!opt.contains(" IN "), s"over-cap geometry still injected pruning:\n$opt")
    clearRegistries()
    val plain = indexed.filter(dist <= lit(r)).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    QuantileGridRadiusPruning.register(spark, hugeCfg, store)
    val got = pruned.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == plain)
    clearRegistries()
  }
}
