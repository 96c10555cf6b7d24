package graft

import graft.operators.SaltedAgg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

class SaltedAggSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted two-phase aggregation equals direct groupBy on a skewed key") {
    // 10k rows, 95% on one hot key — the shape that melts a single reducer
    val rows = (0 until 10000).map { i =>
      (if (i % 20 == 0) s"key_${i % 7}" else "hot", i.toLong, (i % 997) / 1000.0)
    }.toDF("k", "id", "v")
    val direct = rows.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v").cast(DecimalType(18, 3))).cast("double").as("v_sum"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val salted = SaltedAgg.aggregate(rows, Seq("k"), col("id"), 16,
        phase1 = Seq("n" -> count(lit(1)), "v_sum" -> sum(col("v").cast(DecimalType(18, 3)))),
        phase2 = Seq("n" -> (c => sum(c)), "v_sum" -> (c => sum(c).cast("double"))))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(salted.toSeq == direct.toSeq)
  }
}
