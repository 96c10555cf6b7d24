package graft

import graft.operators.Ranking
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = (1 to 500).map { i =>
    (i.toLong, (i * 7919) % 97) // duplicate values -> real tie-breaking
  }.toDF("id", "v")

  test("globalRowNumber equals the unpartitioned window rank") {
    val order = Seq(col("v").desc, col("id").asc)
    val got = Ranking.globalRowNumber(df, order, "rnk")
      .select("id", "rnk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rnk",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "rnk").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("globalRowNumber never funnels data into a single partition") {
    val out = Ranking.globalRowNumber(df, Seq(col("v").asc, col("id").asc),
      "rnk", numPartitions = 7)
    assert(out.rdd.getNumPartitions == 7,
      s"ranking must stay range-partitioned, got ${out.rdd.getNumPartitions} partitions")
    // and ranks stay globally consistent across those partitions
    assert(out.select("rnk").collect().map(_.getLong(0)).sorted.toSeq == (1L to 500L))
  }

  test("globalRowNumber is a dense 1..n permutation across partitions") {
    val ranks = Ranking.globalRowNumber(df, Seq(col("v").asc, col("id").asc),
      "rnk", numPartitions = 7).select("rnk").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to 500L))
  }
}
