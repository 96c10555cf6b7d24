package graft

import graft.index.ZoneMap
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming zone-map maintenance: per-batch stats folded into the
  * persisted stats table must equal a one-shot recompute over everything
  * ingested — the metadata loop that keeps data skipping current while the
  * store only ever appends. */
class StreamingZoneMapSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed stats fold equals one-shot recompute") {
    implicit val sqlCtx = spark.sqlContext
    // fixed path under target/ — reused across runs, removed by `sbt clean`
    val statsDir = "target/tmp/zm_stats/stats"
    val root = new java.io.File("target/tmp/zm_stats")
    if (root.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }

    val batch1 = Seq((1L, 10L), (1L, 30L), (2L, 100L))
    val batch2 = Seq((1L, 5L), (3L, 7L))
    val batch3 = Seq((2L, 250L), (3L, 2L))

    val stream = MemoryStream[(Long, Long)]
    val writer = StreamingIngest.zoneMapMaintain(
      stream.toDF().toDF("bucket", "v"), col("bucket"), col("v"), statsDir)
    val q = writer.start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      stream.addData(batch3); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(statsDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val oneShot = ZoneMap.stats(
        (batch1 ++ batch2 ++ batch3).toDF("bucket", "v"), col("bucket"), col("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == oneShot)
    assert(streamed == Map(1L -> (5L, 30L), 2L -> (100L, 250L), 3L -> (2L, 7L)))
  }
}
