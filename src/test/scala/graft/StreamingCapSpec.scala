package graft

import graft.operators.Governance
import graft.streaming.StreamCap
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming per-key admission cap ≡ batch capPerKey under event-time-
  * ordered arrival; the cap holds across micro-batch boundaries (state
  * carries the admitted count, so a key filled in batch 1 admits nothing
  * in batch 3).
  */
class StreamingCapSpec extends SparkSpecBase {
  import spark.implicits._

  private val batch1 = Seq(("a", 1L, 10L), ("a", 2L, 11L), ("b", 3L, 12L))
  private val batch2 = Seq(("a", 4L, 13L), ("b", 5L, 14L), ("c", 6L, 15L))
  private val batch3 = Seq(("a", 7L, 16L), ("b", 8L, 17L))

  test("streamed admission ≡ batch capPerKey on event-time-ordered input") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, Long)]
    val q = StreamCap.capPerKeyStreaming(
        stream.toDF().toDF("src", "ts", "id"), "src", "ts", "id", n = 2)
      .writeStream.format("memory").queryName("cap_out")
      .outputMode("append").start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      stream.addData(batch3); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("cap_out")
      .select("k", "t", "i").as[(String, Long, Long)].collect().toSet
    val batch = Governance.capPerKey(
        (batch1 ++ batch2 ++ batch3).toDF("src", "ts", "id"), "src", 2,
        Seq(col("ts").asc, col("id").asc))
      .select("src", "ts", "id").as[(String, Long, Long)].collect().toSet
    assert(streamed === batch)
    // the cross-batch carry is what's under test: 'a' fills in batch 1,
    // so its batch-2 and batch-3 rows are rejected by STATE, not by the
    // within-batch take
    assert(streamed === Set(
      ("a", 1L, 10L), ("a", 2L, 11L), ("b", 3L, 12L),
      ("b", 5L, 14L), ("c", 6L, 15L)))
  }

  test("intra-batch admission follows (ts, id), not arrival permutation") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Long, Long)]
    val q = StreamCap.capPerKeyStreaming(
        stream.toDF().toDF("src", "ts", "id"), "src", "ts", "id", n = 1)
      .writeStream.format("memory").queryName("cap_out2")
      .outputMode("append").start()
    try {
      // shuffled within the batch: the later-ts row listed first
      stream.addData(Seq(("x", 9L, 2L), ("x", 1L, 1L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cap_out2")
      .select("k", "t", "i").as[(String, Long, Long)].collect().toSet
    assert(got === Set(("x", 1L, 1L)))
  }
}
