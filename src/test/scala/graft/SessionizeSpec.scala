package graft

import graft.core.Tables
import graft.streaming.Sessionize
import graft.streaming.Sessionize.StreamEv
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class SessionizeSpec extends SparkSpecBase {
  import spark.implicits._

  private val Gap = 30

  private lazy val fixtureEvents =
    Tables.events(spark, sfDir).select("user_id", "event_id", "ts", "value")

  private lazy val batchResult =
    Sessionize.batch(fixtureEvents, Gap)
      .orderBy("user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))

  test("batch sessionization: sessions are gap-separated and cover all events") {
    val total = batchResult.map(_._5).sum
    assert(total == fixtureEvents.count())
    // within a user, consecutive sessions are separated by > gap
    batchResult.groupBy(_._1).foreach { case (_, ss) =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(b._3 - a._4 > Gap * 60L)
        case _ =>
      }
    }
    // session bounds are ordered
    assert(batchResult.forall(s => s._3 <= s._4))
  }

  test("streaming flatMapGroupsWithState equals batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val evs = fixtureEvents
      .collect()
      .map(r => StreamEv(r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .sortBy(e => e.ts.getTime)
    val (first, second) = evs.splitAt(evs.length / 2)
    val maxTs = evs.map(_.ts.getTime).max
    // sentinel far-future event for a fake user: advances the watermark past
    // every open session's timeout so all real sessions close.
    val sentinel = StreamEv(-1L, Long.MaxValue, new Timestamp(maxTs + 86400L * 1000L), 0.0)

    val stream = MemoryStream[StreamEv]
    val q = Sessionize.streaming(stream.toDS(), Gap)
      .writeStream.format("memory").queryName("sess_out").outputMode(OutputMode.Append()).start()
    try {
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
      stream.addData(Seq(sentinel)); q.processAllAvailable()
      // one more batch so the timeout (triggered by the advanced watermark) fires
      stream.addData(Seq(sentinel.copy(event_id = Long.MaxValue - 1,
        ts = new Timestamp(maxTs + 2 * 86400L * 1000L)))); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sess_out")
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(streamed.toSeq == batchResult.toSeq)
  }

  test("streaming native session_window equals the batch session_window aggregation") {
    // the third sessionization form: Spark's built-in session_window in a
    // streaming aggregation (watermark-merged state) must produce the same
    // sessions as the batch groupBy over the same bounded input
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val events = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "ts", "value").limit(2000)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val stream = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val agg = stream.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("s"), col("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("native_sess_out").start()
    try {
      stream.addData(events.toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("native_sess_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = events.toSeq.toDF("user_id", "ts", "value")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("s"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("event far below the watermark does not crash the query (timeout clamped)") {
    // Pre-fix, setTimeoutTimestamp threw IllegalArgumentException when the
    // proposed timeout (last event + gap) was not above the watermark — one
    // sufficiently late event killed the whole streaming query (ADVICE r1).
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * 1000L
    def ev(user: Long, id: Long, offMs: Long) =
      StreamEv(user, id, new Timestamp(base + offMs), 1.0)
    val day = 86400L * 1000L

    // The crash window needs the SPARK-40925 two-watermark gap: the late
    // filter uses the PREVIOUS batch's watermark, state eviction the current
    // one. No-data micro-batches would close that gap between addData calls.
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val stream = MemoryStream[StreamEv]
    val q = Sessionize.streaming(stream.toDS(), Gap)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode(OutputMode.Append()).start()
    try {
      stream.addData(Seq(ev(1L, 1L, 10 * day))); q.processAllAvailable() // after: watermark = base+10d
      // passes the late filter (prev wm = 0) but proposed timeout << eviction wm
      stream.addData(Seq(ev(2L, 2L, 0L))); q.processAllAvailable()
      stream.addData(Seq(ev(1L, 3L, 20 * day))); q.processAllAvailable() // advance wm past clamp
      stream.addData(Seq(ev(1L, 4L, 30 * day))); q.processAllAvailable() // clamped timeout fires
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }

    val u2 = spark.table("sess_late").filter(col("user_id") === 2L).collect()
    assert(u2.length == 1 && u2.head.getLong(4) == 1L)
  }
}
