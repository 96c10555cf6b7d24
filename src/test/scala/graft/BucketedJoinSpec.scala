package graft

import graft.core.Tables
import graft.store.Bucketed
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** The bucketed-layout contract: a join of two tables bucketed on the join
  * key runs with ZERO shuffle exchanges (the scans already satisfy the
  * join's distribution), and returns exactly the rows of the plain join.
  * Broadcast is disabled inside the suite so the co-location claim is
  * tested against the sort-merge path it exists for — at 100 TB neither
  * fact side broadcasts. */
class BucketedJoinSpec extends SparkSpecBase {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed fact-to-fact join: zero shuffles, result equals plain join") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val orders = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_totalprice"))
      val cust = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"))
      Bucketed.writeBucketed(orders, "spec_orders_bk", "o_custkey", 4)
      Bucketed.writeBucketed(cust, "spec_customer_bk", "c_custkey", 4)

      val j = spark.table("spec_orders_bk")
        .join(spark.table("spec_customer_bk"),
          col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan
      assert(plan.collect { case s: SortMergeJoinExec => s }.size == 1,
        s"expected a sort-merge join:\n$plan")
      val nShuffles = plan.collect { case e: ShuffleExchangeExec => e }.size
      assert(nShuffles == 0, s"expected 0 shuffles, got $nShuffles:\n$plan")

      val got = j.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = orders.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want)
    }
  }

  test("mismatched bucket counts still join correctly (Spark re-shuffles one side)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val orders = Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"))
      Bucketed.writeBucketed(orders, "spec_orders_bk8", "o_custkey", 8)
      val cust = Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_name"))
      Bucketed.writeBucketed(cust, "spec_customer_bk4", "c_custkey", 4)
      val j = spark.table("spec_orders_bk8")
        .join(spark.table("spec_customer_bk4"),
          col("o_custkey") === col("c_custkey"))
      assert(j.count() == orders.join(cust,
        col("o_custkey") === col("c_custkey")).count())
    }
  }
}
