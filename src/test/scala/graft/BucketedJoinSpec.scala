package graft

import graft.api.VectorDatabase
import graft.index.GridConfig
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join technique for repeated large joins at
  * 100 TB: both sides pre-hashed into the same bucket layout at write time,
  * so the join needs NO shuffle at read time. Proven here on the orders ⋈
  * customer key with plan-shape assertions (facade kNN join sugar is
  * exercised alongside). */
class BucketedJoinSpec extends SparkSpecBase {

  test("joining two tables bucketed on the key needs zero shuffles") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // bucketed-join requires the shuffle-less path not be beaten by a
    // broadcast: disable auto-broadcast for this check
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"$sfDir/orders.parquet")
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("orders_b")
      spark.read.parquet(s"$sfDir/customer.parquet")
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("customer_b")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      val shuffles = joined.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }.size
      assert(shuffles == 0, s"bucketed join must not shuffle, got $shuffles exchanges")
      // and it is still correct
      val viaBuckets = joined.count()
      val direct = spark.read.parquet(s"$sfDir/orders.parquet")
        .join(spark.read.parquet(s"$sfDir/customer.parquet"),
          col("o_custkey") === col("c_custkey")).count()
      assert(viaBuckets == direct)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("facade knnJoin returns k rows per query, ranked by (dist, id)") {
    val cfg = GridConfig(dim = 64, lower = -0.6, upper = 0.6, partsPerDim = 4, gridDims = 3)
    val db = VectorDatabase.fromDataFrame(spark,
      spark.read.parquet(s"$sfDir/embeddings.parquet"), cfg)
    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 4).select(col("vec_id").as("query_id"), col("embedding"))
    val out = db.knnJoin(queries, k = 5).collect()
    assert(out.length == 4 * 5)
    assert(out.groupBy(_.getLong(0)).forall(_._2.length == 5))
  }
}
