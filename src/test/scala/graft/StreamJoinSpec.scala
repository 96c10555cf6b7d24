package graft

import graft.core.Tables
import graft.streaming.StreamJoin
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

object StreamJoinSpec {
  case class Ev(event_id: Long, user_id: Long, ts: Timestamp)
}

class StreamJoinSpec extends SparkSpecBase {
  import spark.implicits._
  import StreamJoinSpec.Ev

  test("stream-stream interval join equals the batch form on fixture events") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sfDir)
    def side(tpe: String): Seq[Ev] = ev.filter(col("event_type") === tpe)
      .select("event_id", "user_id", "ts").collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSeq

    val clicks = side("click")
    val purchases = side("purchase")
    val maxTs = (clicks ++ purchases).map(_.ts.getTime).max

    val expected = StreamJoin.batch(
        clicks.toDF().select(col("event_id").as("click_id"), col("user_id"), col("ts").as("t_click")),
        purchases.toDF().select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("t_purchase")),
        "user_id", "p_user", "t_click", "t_purchase", windowSec = 1800)
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture should produce click->purchase pairs")

    val cStream = MemoryStream[Ev]
    val pStream = MemoryStream[Ev]
    val joined = StreamJoin.streaming(
      cStream.toDF().select(col("event_id").as("click_id"), col("user_id"), col("ts").as("t_click")),
      pStream.toDF().select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("t_purchase")),
      "user_id", "p_user", "t_click", "t_purchase", windowSec = 1800, delay = "10 seconds")
    val q = joined.select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // two in-order halves, then a watermark-advancing sentinel per side
      val (c1, c2) = clicks.sortBy(_.ts.getTime).splitAt(clicks.length / 2)
      val (p1, p2) = purchases.sortBy(_.ts.getTime).splitAt(purchases.length / 2)
      cStream.addData(c1); pStream.addData(p1); q.processAllAvailable()
      cStream.addData(c2); pStream.addData(p2); q.processAllAvailable()
      cStream.addData(Seq(Ev(-1L, -1L, new Timestamp(maxTs + 86400L * 1000L))))
      pStream.addData(Seq(Ev(-2L, -1L, new Timestamp(maxTs + 86400L * 1000L))))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sj_out")
      .filter(col("click_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected,
      s"missing=${(expected -- streamed).take(5)} extra=${(streamed -- expected).take(5)}")
  }

  test("stream-stream LEFT OUTER interval join equals batch once the watermark finalizes unmatched rows") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * 1000L
    def ev(id: Long, user: Long, offSec: Long) = Ev(id, user, new Timestamp(base + offSec * 1000L))
    // user 1: click 10 matched by purchase 11 within 30 min; click 12 unmatched
    // user 2: click 20 unmatched (purchase 21 arrives after the window)
    val clicks = Seq(ev(10L, 1L, 0), ev(12L, 1L, 10000), ev(20L, 2L, 0))
    val purchases = Seq(ev(11L, 1L, 600), ev(21L, 2L, 4000))

    def lhs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id").as("click_id"), col("user_id"), col("ts").as("t_click"))
    def rhs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id").as("purchase_id"), col("user_id").as("p_user"), col("ts").as("t_purchase"))

    val expected = StreamJoin.batch(lhs(clicks.toDF()), rhs(purchases.toDF()),
        "user_id", "p_user", "t_click", "t_purchase", 1800, joinType = "left_outer")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(expected == Set((10L, 11L), (12L, -1L), (20L, -1L)))

    val cStream = MemoryStream[Ev]
    val pStream = MemoryStream[Ev]
    val q = StreamJoin.streaming(lhs(cStream.toDF()), rhs(pStream.toDF()),
        "user_id", "p_user", "t_click", "t_purchase", 1800, "10 seconds", joinType = "left_outer")
      .select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("sj_outer")
      .outputMode(OutputMode.Append()).start()
    try {
      cStream.addData(clicks); pStream.addData(purchases); q.processAllAvailable()
      // watermark far past every click's t+window finalizes the unmatched rows
      cStream.addData(Seq(ev(-1L, -1L, 864000))); pStream.addData(Seq(ev(-2L, -1L, 864000)))
      q.processAllAvailable()
      cStream.addData(Seq(ev(-3L, -1L, 2 * 864000))); pStream.addData(Seq(ev(-4L, -1L, 2 * 864000)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sj_outer").filter(col("click_id") >= 0)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(streamed == expected, s"streamed=$streamed expected=$expected")
  }
}
