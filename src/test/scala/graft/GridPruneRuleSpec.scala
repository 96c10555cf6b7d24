package graft

import graft.functions.Distances
import graft.index.{Grid, GridConfig}
import graft.plans.GridRadiusPruning
import org.apache.spark.sql.functions._

class GridPruneRuleSpec extends SparkSpecBase {
  import spark.implicits._

  // 2-D geometry so the cell bounds genuinely discriminate: 16 cells over
  // [0,1]^2, query in the lower-left corner, radius covering ~the corner
  // quadrant. (On the 64-dim fixture a radius large enough to match rows
  // exceeds every 3-dim cell bound and the rule correctly no-ops.)
  private lazy val cfg =
    GridConfig(dim = 2, lower = 0.0, upper = 1.0, partsPerDim = 4, gridDims = 2)
  private lazy val pts = {
    val rnd = new scala.util.Random(42)
    (0 until 400).map(i => (i.toLong, Array(rnd.nextFloat(), rnd.nextFloat())))
  }
  private lazy val store = {
    val p = java.nio.file.Files.createTempDirectory("graft_prune_rule").toString
    Grid.withCellId(pts.toDF("vec_id", "embedding"), "embedding", cfg)
      .write.mode("overwrite").partitionBy("cell_id").parquet(p)
    p
  }
  private val q = Array(0.1, 0.1)
  private val r = 0.04 // squared radius -> euclidean 0.2

  test("radius filter auto-gains cell pruning; result identical to the plain filter") {
    GridRadiusPruning.register(spark, cfg, store)
    val indexed = spark.read.parquet(store)
    val dist = Distances.squaredL2Lit(col("embedding"), q)
    val pruned = indexed.filter(dist <= lit(r)).select("vec_id")
    // the injected IN must appear in the optimized plan...
    val opt = pruned.queryExecution.optimizedPlan.toString
    assert(opt.contains("cell_id") && opt.contains(" IN "),
      s"no pruning conjunct injected:\n$opt")
    // ...and reach the scan as a PARTITION filter (files for far cells
    // are never opened)
    val phys = pruned.queryExecution.executedPlan.toString
    assert(phys.contains("PartitionFilters") &&
      phys.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("cell_id"),
      s"pruning did not reach the scan:\n$phys")
    // equality against the same filter WITHOUT the registered rule
    spark.conf.unset(GridRadiusPruning.ConfKey)
    try {
      val plain = indexed.filter(dist <= lit(r)).select("vec_id")
      val got = pruned.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == plain.collect().map(_.getLong(0)).sorted.toSeq)
      assert(got.nonEmpty, "radius must be non-vacuous")
    } finally GridRadiusPruning.register(spark, cfg, store)
  }

  test("rule is admissible: brute membership check per point") {
    GridRadiusPruning.register(spark, cfg, store)
    val indexed = spark.read.parquet(store)
    val dist = Distances.squaredL2Lit(col("embedding"), q)
    val got = indexed.filter(dist <= lit(r))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = pts.filter { case (_, v) =>
      val dx = v(0).toDouble - q(0); val dy = v(1).toDouble - q(1)
      dx * dx + dy * dy <= r
    }.map(_._1).toSet
    assert(got == want)
  }

  test("all four reference metrics prune admissibly (≡ brute membership)") {
    GridRadiusPruning.register(spark, cfg, store)
    val indexed = spark.read.parquet(store)
    val invDiag = Array(1.0, 2.0)
    val cases = Seq[(String, org.apache.spark.sql.Column, (Double, Double) => Double)](
      ("sql2", Distances.squaredL2Lit(col("embedding"), q),
        (dx, dy) => dx * dx + dy * dy),
      ("l1", Distances.l1Lit(col("embedding"), q),
        (dx, dy) => math.abs(dx) + math.abs(dy)),
      ("linf", Distances.lInfLit(col("embedding"), q),
        (dx, dy) => math.max(math.abs(dx), math.abs(dy))),
      ("maha", Distances.mahalanobisDiagLit(col("embedding"), q, invDiag),
        (dx, dy) => dx * dx * invDiag(0) + dy * dy * invDiag(1)))
    for ((name, expr, ref) <- cases) {
      val rr = if (name == "l1" || name == "linf") 0.2 else 0.04
      val df = indexed.filter(expr <= lit(rr))
      assert(df.queryExecution.optimizedPlan.toString
        .matches("(?s).*cell_id#\\d+L? IN.*"), s"$name: rule did not fire")
      val got = df.select("vec_id").collect().map(_.getLong(0)).toSet
      val want = pts.filter { case (_, v) =>
        ref(v(0).toDouble - q(0), v(1).toDouble - q(1)) <= rr
      }.map(_._1).toSet
      assert(got == want, s"$name: pruned set diverges from brute")
      assert(want.nonEmpty, s"$name: radius vacuous")
    }
  }

  test("dim-mismatched query never prunes against a foreign grid config") {
    GridRadiusPruning.register(spark, cfg, store) // 2-dim geometry registered
    val indexed = spark.read.parquet(store)
    val q64 = Array.fill(64)(0.1)
    val df = indexed.filter(
      Distances.squaredL2Lit(col("embedding"), q64) <= lit(5.0))
    assert(!df.queryExecution.optimizedPlan.toString
      .matches("(?s).*cell_id#\\d+L? IN.*"),
      "a 64-dim predicate must not be pruned with the 2-dim config's bounds")
  }

  test("fingerprinted in-memory column prunes via metadata; a FOREIGN geometry's column refuses") {
    spark.conf.unset(GridRadiusPruning.ConfKey)
    try {
      GridRadiusPruning.register(spark, cfg, store)
      val dist = Distances.squaredL2Lit(col("embedding"), q)
      // a store written WITHOUT partitionBy keeps cell_id as a DATA
      // column — fingerprint metadata survives the parquet footer and
      // binds the column to its geometry with no path registration
      def flatStore(g: graft.index.GridConfig): String = {
        val p = java.nio.file.Files.createTempDirectory("graft_prune_md").toString
        Grid.withCellId(pts.toDF("vec_id", "embedding"), "embedding", g)
          .write.mode("overwrite").parquet(p)
        p
      }
      val own = spark.read.parquet(flatStore(cfg)).filter(dist <= lit(r))
      assert(own.queryExecution.optimizedPlan.toString
        .matches("(?s).*cell_id#\\d+L? IN.*"),
        "metadata-bound same-geometry column must prune")
      // same dim, DIFFERENT geometry: its fingerprint matches no
      // registered config — an IN computed from cfg's bounds would be
      // inadmissible, so the rule must refuse
      val foreign = cfg.copy(partsPerDim = 8)
      val foreignStore = flatStore(foreign)
      val other = spark.read.parquet(foreignStore).filter(dist <= lit(r))
      assert(!other.queryExecution.optimizedPlan.toString
        .matches("(?s).*cell_id#\\d+L? IN.*"),
        "foreign-geometry fingerprint must never be pruned with this config")
      // ...until its geometry is ALSO registered (multi-config registry)
      GridRadiusPruning.register(spark, foreign)
      val bothReg = spark.read.parquet(foreignStore).filter(dist <= lit(r))
      assert(bothReg.queryExecution.optimizedPlan.toString
        .matches("(?s).*cell_id#\\d+L? IN.*"),
        "registered foreign geometry must prune under ITS OWN bounds")
    } finally {
      spark.conf.unset(GridRadiusPruning.ConfKey)
      GridRadiusPruning.register(spark, cfg, store)
    }
  }

  test("ambiguous same-dim UNBOUND configs refuse to prune a metadata-less column") {
    spark.conf.unset(GridRadiusPruning.ConfKey)
    try {
      // two unbound dim-2 geometries: a metadata-less cell_id (parquet
      // partition column) cannot be attributed to either — must refuse
      GridRadiusPruning.register(spark, cfg)
      GridRadiusPruning.register(spark, cfg.copy(partsPerDim = 8))
      val dist = Distances.squaredL2Lit(col("embedding"), q)
      val df = spark.read.parquet(store).filter(dist <= lit(r))
      assert(!df.queryExecution.optimizedPlan.toString
        .matches("(?s).*cell_id#\\d+L? IN.*"),
        "two same-dim candidates: the rule must not guess")
      // binding one of them to the store path disambiguates
      GridRadiusPruning.register(spark, cfg, store)
      val bound = spark.read.parquet(store).filter(dist <= lit(r))
      assert(bound.queryExecution.optimizedPlan.toString
        .matches("(?s).*cell_id#\\d+L? IN.*"),
        "path binding must restore pruning")
    } finally {
      spark.conf.unset(GridRadiusPruning.ConfKey)
      GridRadiusPruning.register(spark, cfg, store)
    }
  }

  test("re-registering a rewritten store path drops the stale geometry (no silent row loss)") {
    spark.conf.unset(GridRadiusPruning.ConfKey)
    try {
      // simulate the Grid.maintain re-bucket workflow: the SAME path first
      // carries the 4-parts geometry, then is rewritten with 8 parts and
      // re-registered. The stale (oldCfg, path) entry preceding the new one
      // must be evicted — otherwise collectFirst binds the OLD geometry and
      // injects an inadmissible cell-id list against the rewritten store.
      val newCfg = cfg.copy(partsPerDim = 8)
      val p = java.nio.file.Files.createTempDirectory("graft_prune_rebkt").toString
      Grid.withCellId(pts.toDF("vec_id", "embedding"), "embedding", cfg)
        .write.mode("overwrite").partitionBy("cell_id").parquet(p)
      GridRadiusPruning.register(spark, cfg, p)
      // rewrite the same path under the NEW geometry and re-register
      Grid.withCellId(pts.toDF("vec_id", "embedding"), "embedding", newCfg)
        .write.mode("overwrite").partitionBy("cell_id").parquet(p)
      GridRadiusPruning.register(spark, newCfg, p)
      val dist = Distances.squaredL2Lit(col("embedding"), q)
      val pruned = spark.read.parquet(p).filter(dist <= lit(r)).select("vec_id")
      assert(pruned.queryExecution.optimizedPlan.toString
        .matches("(?s).*cell_id#\\d+L? IN.*"), "re-registered path must still prune")
      spark.conf.unset(GridRadiusPruning.ConfKey)
      val plain = spark.read.parquet(p).filter(dist <= lit(r)).select("vec_id")
      val got = pruned.collect().map(_.getLong(0)).sorted.toSeq
      val want = plain.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want,
        s"stale geometry binding dropped rows: pruned ${got.size} vs plain ${want.size}")
    } finally {
      spark.conf.unset(GridRadiusPruning.ConfKey)
      GridRadiusPruning.register(spark, cfg, store)
    }
  }

  test("rule is a no-op without cell_id, and terminates at fixed point") {
    GridRadiusPruning.register(spark, cfg, store)
    val plainDf = pts.toDF("vec_id", "embedding") // no cell_id column
    val dist = Distances.squaredL2Lit(col("embedding"), q)
    val df = plainDf.filter(dist <= lit(r))
    assert(!df.queryExecution.optimizedPlan.toString.contains("cell_id"))
    // double-apply on the indexed store must not stack a second IN
    val indexed = spark.read.parquet(store)
    val pruned = indexed.filter(dist <= lit(r))
    val inCount = "cell_id#\\d+L? IN".r
      .findAllIn(pruned.queryExecution.optimizedPlan.toString).size
    assert(inCount <= 1, s"rule must not re-fire, found $inCount IN conjuncts")
  }
}
