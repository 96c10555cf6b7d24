package graft

import graft.api.VectorDatabase
import graft.index.GridConfig
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The 100 TB claim behind the grid index: a cell-partitioned store turns
  * candidate-cell predicates into FILE-LEVEL pruning — the scan must read
  * strictly fewer files/partitions than the full store holds. */
class PartitionPruneSpec extends SparkSpecBase {

  private lazy val storePath = {
    val path = java.nio.file.Files.createTempDirectory("graft_store").toString
    val cfg = GridConfig(dim = 64, lower = -0.6, upper = 0.6, partsPerDim = 4, gridDims = 3)
    val db = VectorDatabase.fromDataFrame(spark,
      spark.read.parquet(s"$sfDir/embeddings.parquet"), cfg)
    db.save(path)
    path
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.queryExecution.toRdd.count() // drive THIS plan so its metrics populate
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
  }

  test("cell predicate becomes a partition filter and skips files") {
    val full = spark.read.parquet(storePath)
    val nCells = full.select("cell_id").distinct().count()
    assert(nCells > 3, s"store must span several cells, got $nCells")

    val prunedDf = full.filter(col("cell_id").isin(0, 1))
    val scan = scanOf(prunedDf)
    assert(scan.partitionFilters.nonEmpty, "cell predicate must be a partition filter")
    val filesRead = scan.metrics("numFiles").value
    val filesTotal = scanOf(full).metrics("numFiles").value
    assert(filesRead < filesTotal,
      s"pruned scan read $filesRead of $filesTotal files — no pruning happened")
  }

  test("joining the store on cell_id against a filtered dim triggers dynamic partition pruning") {
    // The runtime analog of the isin-literal test above: when the candidate
    // cells come from a JOIN (e.g. "cells whose stats say they are hot"),
    // Catalyst's DPP injects the dim-side values as a runtime partition
    // filter — at 100 TB the fact scan still skips files even though no
    // literal cell list exists at plan time.
    val full = spark.read.parquet(storePath)
    val interesting = spark.range(64)
      .select(col("id").cast("int").as("cell_id"), (col("id") % 7).as("w"))
      .filter(col("w") === 0)
    val joined = full.join(interesting, "cell_id")
    joined.queryExecution.toRdd.count()
    // AQE nests the scan inside query stages; assert on the full plan string
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in the plan:\n$planStr")
  }

  test("runtime Bloom-filter join pruning fires on non-partition join keys") {
    // cell_id pruning covers the partition column; for joins on ORDINARY
    // columns (vec_id enrichments at 100 TB) Spark's runtime bloom filter
    // pushes a membership test from the selective side into the big scan.
    // Fixture sizes sit below the default creation thresholds, so force
    // them to 0 for the plan assertion.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // applicationSideScanSizeThreshold is a MINIMUM app-side size (10GB
      // default) — drop it so fixture-sized scans qualify; the creation-side
      // threshold is a MAXIMUM and the dim already sits under it
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // the rule only injects when the application side shuffles (a
      // broadcast join would make the filter pointless) — tiny fixtures
      // would broadcast, so force a shuffle join
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (key, _) => key -> spark.conf.getOption(key) }
    confs.foreach { case (key, v) => spark.conf.set(key, v) }
    try {
      val big = spark.read.parquet(storePath)
      val dim = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .filter(col("label") === 3).select(col("vec_id").as("sel_id"))
      val joined = big.join(dim, col("vec_id") === col("sel_id"))
      val planStr = joined.queryExecution.optimizedPlan.toString
      assert(planStr.contains("bloom_filter_agg") || planStr.contains("might_contain"),
        s"expected a runtime bloom filter in the optimized plan:\n$planStr")
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (key, Some(v)) => spark.conf.set(key, v)
      case (key, None) => spark.conf.unset(key)
    }
  }

  test("a signature-partitioned store turns multi-probe LSH into file pruning") {
    // the lexical analog of the cell store: bucket the store by the LSH
    // signature and the multi-probe `sig IN (...)` predicate becomes
    // partition pruning — the scan never touches unprobed buckets
    val planes = graft.core.Fixtures.Planes16.take(4) // 16 buckets
    // fixed path under target/ — reused across runs, removed by `sbt clean`
    // (the temp-dir-per-run pattern leaked disk, cf. round-3 review)
    val sigStore = "target/tmp/graft_sig_store"
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("lsh_sig",
        graft.operators.Ann.lshSignature(col("embedding"), planes))
      .write.partitionBy("lsh_sig").mode("overwrite").parquet(sigStore)
    val full = spark.read.parquet(sigStore)
    val probes = graft.operators.Ann.multiProbeSigs(planes, graft.core.Fixtures.Q64)
    val pruned = full.filter(col("lsh_sig").isin(probes: _*))
    val scan = scanOf(pruned)
    assert(scan.partitionFilters.nonEmpty, "sig predicate must be a partition filter")
    val filesRead = scan.metrics("numFiles").value
    val filesTotal = scanOf(full).metrics("numFiles").value
    assert(filesRead < filesTotal,
      s"probed scan read $filesRead of $filesTotal files — no pruning")
  }

  test("a band-partitioned store turns MIPS band pruning into file pruning, result exact") {
    // the dot-metric analog of the cell store: partition by the weight
    // band and Mips.prunedTopK's `band isin` candidate predicate becomes
    // partition pruning — high-k hot queries touch only the high-magnitude
    // slice of the corpus
    val bandStore = "target/tmp/graft_band_store"
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("weight", (lit(1) + col("vec_id") % 10).cast("double"))
      .withColumn("band", (col("vec_id") % 10).cast("long"))
      .write.partitionBy("band").mode("overwrite").parquet(bandStore)
    val full = spark.read.parquet(bandStore)
      .withColumn("band", col("band").cast("long"))
    val q = graft.core.Fixtures.Q64
    // scanning only the top few bands must skip files
    val pruned = full.filter(col("band").isin(9L, 8L, 7L))
    val scan = scanOf(pruned)
    assert(scan.partitionFilters.nonEmpty, "band predicate must be a partition filter")
    assert(scan.metrics("numFiles").value < scanOf(full).metrics("numFiles").value)
    // and the pruned top-k off the LOADED store equals brute
    val got = graft.operators.Mips.prunedTopK(spark, full, q, 10,
        bruteForceThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val brute = full
      .withColumn("dot", col("weight") *
        graft.functions.Distances.dotLit(col("embedding"), q))
      .orderBy(col("dot").desc, col("vec_id").asc).limit(10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dot"))).toSeq
    assert(got === brute)
  }

  test("kNN over the loaded partitioned store equals brute force") {
    val cfg = GridConfig(dim = 64, lower = -0.6, upper = 0.6, partsPerDim = 4, gridDims = 3)
    val db = VectorDatabase.load(spark, storePath, cfg)
    val q = graft.core.Fixtures.Q64
    val viaStore = db.findKNearestNeighbors(q, 10).map(n => (n.vec_id, n.dist))
    val brute = graft.operators.Knn.bruteForce(
        spark.read.parquet(s"$sfDir/embeddings.parquet"),
        graft.functions.Distances.squaredL2Lit(col("embedding"), q), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(viaStore == brute)
  }
}
