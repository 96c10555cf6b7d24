package graft

import graft.operators.BinnedRangeJoin
import org.apache.spark.sql.functions._

class BinnedRangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def bands = Seq(
    ("b0", 0.0, 50000.0), ("b1", 50000.0, 100000.0),
    ("b2", 100000.0, 200000.0), ("b3", 200000.0, 1e18)
  ).toDF("band", "lo", "hi")

  test("binned range join equals the nested-loop range join") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val nlj = orders
      .join(bands, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val binned = BinnedRangeJoin.join(orders, col("o_totalprice"), bands,
        "lo", "hi", binWidth = 50000.0, hiClamp = 1e6)
      .groupBy("band").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(binned == nlj)
    assert(binned.values.sum == orders.count()) // bands partition the domain
  }

  test("plan is an equi join, not a broadcast nested loop") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val plan = BinnedRangeJoin.join(orders, col("o_totalprice"), bands,
        "lo", "hi", 50000.0, 1e6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(500))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan.take(500))
  }

  test("randomized: binned join equals nested loop for arbitrary intervals") {
    val rnd = new scala.util.Random(77)
    for (trial <- 0 until 5) {
      val facts = Seq.fill(200)(rnd.nextDouble() * 1000 - 100).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("fid", "v")
      val ivs = Seq.fill(8) {
        val lo = rnd.nextDouble() * 900 - 100
        (s"iv${rnd.nextInt(1000)}", lo, lo + rnd.nextDouble() * 300)
      }.zipWithIndex.map { case ((n, lo, hi), i) => (s"${n}_$i", lo, hi) }
        .toDF("band", "lo", "hi")
      val bw = 10.0 + rnd.nextDouble() * 200 // bin width ≠ interval scale
      val nlj = facts.join(ivs, col("v") >= col("lo") && col("v") < col("hi"))
        .select("fid", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val binned = BinnedRangeJoin.join(facts, col("v"), ivs, "lo", "hi", bw, hiClamp = 1000.0)
        .select("fid", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(binned == nlj, s"trial $trial (binWidth $bw)")
    }
  }

  test("boundary values land in the right band (exact re-check)") {
    val facts = Seq(0.0, 49999.99, 50000.0, 99999.99, 200000.0).toDF("v")
    val got = BinnedRangeJoin.join(facts, col("v"), bands, "lo", "hi", 50000.0, 1e6)
      .select("v", "band").collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got == Map(0.0 -> "b0", 49999.99 -> "b0", 50000.0 -> "b1",
      99999.99 -> "b1", 200000.0 -> "b3"))
  }
}
