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
}
