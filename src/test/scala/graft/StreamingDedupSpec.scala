package graft

import graft.streaming.StreamingIngest
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("stream-static join enriches a stream against a batch dimension") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val stream = MemoryStream[(Long, Long, Double)]
    val enriched = stream.toDF().toDF("event_id", "user_id", "value")
      .join(dim, Seq("user_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      stream.addData((10L, 1L, 1.0), (11L, 2L, 2.0), (12L, 3L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("enrich_out")
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(10L).contains("gold") && out(11L).contains("silver") && out(12L).isEmpty)
  }

  test("batched multimodal extraction equals the per-row form (batch boundaries invisible)") {
    val media = graft.multimodal.Multimodal.mediaFromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(100))
    val perRow = graft.multimodal.Multimodal.extractFeatures(media)
      .collect().sortBy(_.media_id).toSeq
    val batched = graft.multimodal.Multimodal.extractFeaturesBatched(media, batchSize = 7)
      .collect().sortBy(_.media_id).toSeq
    assert(batched == perRow)
  }

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
