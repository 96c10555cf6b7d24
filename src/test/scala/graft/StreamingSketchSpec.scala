package graft

import graft.streaming.StreamSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed KMV ≡ batch KMV: the k-smallest-hash state is a monoid, so a
  * left fold over arbitrary micro-batch boundaries must land on exactly
  * the batch sketch of the full input. */
class StreamingSketchSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed KMV converges to the batch sketch regardless of batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val k = 32
    // two keys; key "a" sees 500 distinct values (saturates k), key "b"
    // sees 10 (stays exact); duplicates re-delivered across batches
    val allA = (0 until 500).map(v => ("a", v.toLong))
    val allB = (0 until 10).map(v => ("b", v.toLong))
    val stream = MemoryStream[(String, Long)]
    val q = StreamSketch.kmvDistinctStreaming(
        stream.toDF().toDF("key", "value"), "key", "value", k)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    try {
      stream.addData(allA.take(200) ++ allB)
      q.processAllAvailable()
      stream.addData(allA.slice(100, 400)) // overlap re-delivers 100..200
      q.processAllAvailable()
      stream.addData(allA.drop(300) ++ allB) // full re-delivery of b
      q.processAllAvailable()
    } finally q.stop()
    // last emitted row per key (update mode re-emits on refresh)
    val last = spark.table("kmv_out").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).map { case (key, rs) => key -> rs.last._2 }
    // batch reference through the SAME estimator
    val batchA = graft.operators.Stats.kmvDistinct(
      allA.map(_._2).toDF("v"), col("v"), k).head()
    assert(last("a")._2 == batchA.getLong(1), "kth hash must equal the batch sketch")
    assert(last("a")._3 == batchA.getDouble(2), "estimate must equal the batch sketch")
    assert(last("b")._1 == 10L && last("b")._3 == 10.0,
      "unsaturated sketch must report the exact distinct count")
  }

  test("streamed per-key top-k equals the batch top-k under re-delivery") {
    implicit val sqlCtx = spark.sqlContext
    val k = 5
    val rnd = new scala.util.Random(3)
    val rows = (0 until 300).map { i =>
      (s"k${i % 3}", i.toLong, math.rint(rnd.nextDouble() * 1000) / 10.0)
    }
    val stream = MemoryStream[(String, Long, Double)]
    val q = StreamSketch.topKStreaming(
        stream.toDF().toDF("key", "id", "score"), "key", "id", "score", k)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    try {
      stream.addData(rows.take(150))
      q.processAllAvailable()
      stream.addData(rows.slice(100, 250)) // 50 rows re-delivered
      q.processAllAvailable()
      stream.addData(rows.drop(250))
      q.processAllAvailable()
    } finally q.stop()
    // final state per key = last k emitted rows for that key
    val got = spark.table("topk_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .groupBy(_._1).map { case (key, rs) =>
        key -> rs.takeRight(k).map(t => (t._2, t._3, t._4)).toSeq }
    val want = rows.groupBy(_._1).map { case (key, rs) =>
      key -> rs.map(t => (t._3, t._2)).sortBy { case (s, i) => (-s, i) }
        .take(k).zipWithIndex.map { case ((s, i), r) => (i, s, r + 1) }.toSeq }
    assert(got == want)
  }

  test("top-k state dedups by id: an updated score replaces the id's slot, never duplicates it") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, Double)]
    val q = StreamSketch.topKStreaming(
        stream.toDF().toDF("key", "id", "score"), "key", "id", "score", k = 3)
      .writeStream.format("memory").queryName("topk_upd")
      .outputMode("update").start()
    try {
      stream.addData(Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0)))
      q.processAllAvailable()
      // id 1 re-delivered with a HIGHER score: must occupy ONE slot at 40
      stream.addData(Seq(("a", 1L, 40.0)))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("topk_upd").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).takeRight(3).toSeq
    assert(last == Seq((1L, 40.0, 1), (3L, 30.0, 2), (2L, 20.0, 3)),
      s"got $last")
  }
}
