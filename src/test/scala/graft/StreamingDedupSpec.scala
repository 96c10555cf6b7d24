package graft

import graft.streaming.StreamingIngest
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("dropDuplicatesWithinWatermark: re-delivered events pass through once") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    def ev(id: Long, offsetSec: Int, v: Double) =
      (id, new Timestamp(t0.getTime + offsetSec * 1000L), v)

    val stream = MemoryStream[(Long, Timestamp, Double)]
    val deduped = StreamingIngest.dedupWithinWatermark(
      stream.toDF().toDF("event_id", "ts", "value"), Seq("event_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 0, 1.0), ev(2, 10, 2.0), ev(1, 0, 1.0)) // dup in-batch
      q.processAllAvailable()
      stream.addData(ev(2, 10, 2.0), ev(3, 20, 3.0))               // dup across batches
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }
}
