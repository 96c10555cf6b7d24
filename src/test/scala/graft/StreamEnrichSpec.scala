package graft

import graft.core.Tables
import graft.streaming.StreamEnrich
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

object StreamEnrichSpec {
  case class Ev(event_id: Long, user_id: Long, ts: Timestamp, value: Double)
}

class StreamEnrichSpec extends SparkSpecBase {
  import spark.implicits._
  import StreamEnrichSpec.Ev

  test("stream-static enrichment equals the batch form on fixture events") {
    implicit val sqlCtx = spark.sqlContext
    val customer = Tables.customer(spark, sfDir)
    val events = Tables.events(spark, sfDir)

    val expected = StreamEnrich.hourlyBySegment(events, customer)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(expected.nonEmpty)

    val evRows = events.select("event_id", "user_id", "ts", "value").collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .sortBy(_.ts.getTime).toSeq
    val maxTs = evRows.map(_.ts.getTime).max

    val stream = MemoryStream[Ev]
    val q = StreamEnrich.hourlyBySegmentStreaming(stream.toDF(), customer, delay = "1 hour")
      .writeStream.format("memory").queryName("se_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val (h1, h2) = evRows.splitAt(evRows.length / 2)
      stream.addData(h1); q.processAllAvailable()
      stream.addData(h2); q.processAllAvailable()
      // watermark-advancing sentinel on a user that joins to no customer:
      // closes every fixture window without contributing a row
      stream.addData(Seq(Ev(-1L, -1L, new Timestamp(maxTs + 7L * 86400L * 1000L), 0.0)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("se_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == expected,
      s"stream/batch mismatch: only-stream=${(streamed -- expected).take(3)} " +
        s"only-batch=${(expected -- streamed).take(3)}")
  }
}
