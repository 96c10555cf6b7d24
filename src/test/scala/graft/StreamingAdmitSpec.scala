package graft

import graft.operators.Dedup
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup admission: batches with intra- and cross-batch
  * duplicates must converge the store to exactly the first-seen canonical
  * of every distinct text — the same rows a one-shot exact dedup of the
  * full input keeps. */
class StreamingAdmitSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed admission equals one-shot exact dedup; re-deliveries never append") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = "target/tmp/admit_store/docs"
    val root = new java.io.File("target/tmp/admit_store")
    if (root.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }

    val batch1 = Seq((0L, "alpha text"), (1L, "beta text"), (2L, "alpha text"))
    val batch2 = Seq((3L, "alpha text"), (4L, "gamma text"))   // 3 is a cross-batch dup
    val batch3 = Seq((4L, "gamma text"), (5L, "delta text"))   // 4 re-delivered verbatim

    val stream = MemoryStream[(Long, String)]
    val q = StreamingIngest.dedupAdmit(
      stream.toDF().toDF("doc_id", "text"), storeDir).start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      stream.addData(batch3); q.processAllAvailable()
    } finally q.stop()

    val stored = spark.read.parquet(storeDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val oneShot = Dedup.exactDedup(
        (batch1 ++ batch2 ++ batch3).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(stored === oneShot)
    assert(stored === Set((0L, "alpha text"), (1L, "beta text"),
      (4L, "gamma text"), (5L, "delta text")))
  }

  test("idempotent ingest: a replayed micro-batch overwrites itself, not appends") {
    val cfg = graft.index.GridConfig(dim = 2, lower = 0.0, upper = 1.0,
      partsPerDim = 2, gridDims = 2)
    val store = java.nio.file.Files.createTempDirectory("graft_idem_ingest").toString
    def batchDf(ids: Range) = ids.map { i =>
      (i.toLong, Array((i % 10) / 10f, (i / 10 % 10) / 10f))
    }.toDF("vec_id", "embedding")
    // batch 0 arrives, then REPLAYS (at-least-once foreachBatch), then batch 1
    StreamingIngest.writeVectorBatchIdempotent(batchDf(0 until 40), 0L, cfg, store)
    StreamingIngest.writeVectorBatchIdempotent(batchDf(0 until 40), 0L, cfg, store)
    StreamingIngest.writeVectorBatchIdempotent(batchDf(40 until 60), 1L, cfg, store)
    val rows = spark.read.parquet(store)
    assert(rows.count() == 60L, "replay must not duplicate batch 0")
    assert(rows.select("vec_id").distinct().count() == 60L)
    // the store stays cell-pruned under the nested partition layout
    assert(rows.select("cell_id").distinct().count() > 1)
  }
}
