package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates (no cross-engine oracle possible — HLL++/KLL internals
  * are engine-specific): pin accuracy bounds against exact answers. */
class SketchSpec extends SparkSpecBase {

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("approx_count_distinct within 5% of exact") {
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = orders.select(approx_count_distinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("approx p50/p99 bracket the exact quantiles") {
    val prices = orders.select("o_totalprice").collect().map(_.getDouble(0)).sorted
    def exactQ(q: Double) = prices(((prices.length - 1) * q).toInt)
    val row = orders.agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col("o_totalprice"), lit(0.99), lit(10000)).as("p99")).head()
    assert(math.abs(row.getDouble(0) - exactQ(0.5)) / exactQ(0.5) < 0.05)
    assert(math.abs(row.getDouble(1) - exactQ(0.99)) / exactQ(0.99) < 0.05)
  }

  test("kmvDistinct estimate lands near the exact count; saturates below k") {
    import spark.implicits._
    val df = (0 until 20000).map(i => i % 5000).toDF("v") // 5000 distinct
    val row = graft.operators.Stats.kmvDistinct(df, col("v"), k = 256).head()
    val (k, est, exact) = (row.getLong(0), row.getDouble(2), row.getLong(3))
    assert(k == 256L && exact == 5000L)
    assert(math.abs(est - exact) / exact < 0.2, s"est $est vs $exact")
    // fewer distinct values than k: the sketch holds them all and k_actual
    // reports the true size (callers detect saturation)
    val small = (0 until 100).toDF("v")
    val r2 = graft.operators.Stats.kmvDistinct(small, col("v"), k = 256).head()
    assert(r2.getLong(0) == 100L && r2.getLong(3) == 100L)
  }

  test("thetaIntersect estimates |A ∩ B| from k-hash samples") {
    import spark.implicits._
    // A = [0, 4000), B = [2000, 6000): exact intersection 2000
    val a = (0 until 4000).toDF("v")
    val b = (2000 until 6000).toDF("v")
    val row = graft.operators.Stats.thetaIntersect(a, b, col("v"), col("v"), k = 512).head()
    val (est, exact) = (row.getDouble(2), row.getLong(3))
    assert(exact == 2000L)
    assert(math.abs(est - exact) / exact < 0.25, s"est $est vs $exact")
    // disjoint sets: estimate must be exactly 0
    val d = graft.operators.Stats.thetaIntersect(
      (0 until 1000).toDF("v"), (5000 until 6000).toDF("v"),
      col("v"), col("v"), k = 128).head()
    assert(d.getLong(1) == 0L && d.getDouble(2) == 0.0 && d.getLong(3) == 0L)
  }
}
