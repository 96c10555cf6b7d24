package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key (row-identical)") {
    // 90% of fact rows hit one hot key — the scenario salting exists for.
    val fact = (0L until 2000L).map { i =>
      val key = if (i % 10 != 0) 7L else i % 50
      (i, key, i.toDouble)
    }.toDF("row_id", "k", "v")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("dk", "name")

    val salted = SaltedJoin.join(fact, dim, "k", "dk", salt = col("row_id"), saltBuckets = 8)
      .select("row_id", "k", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("row_id", "k", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salted join spreads a hot key over multiple shuffle partitions") {
    // Distinct (key, salt) pairs for the hot key == saltBuckets, so the
    // hot key's rows hash to saltBuckets different reducers.
    val fact = (0L until 1000L).map(i => (i, 7L)).toDF("row_id", "k")
    val salts = fact
      .withColumn("salt", pmod(col("row_id"), lit(8)))
      .select("salt").distinct().count()
    assert(salts == 8)
  }
}
