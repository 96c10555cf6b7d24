package graft

import graft.operators.Snapshot
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC apply: a changelog stream (upserts + deletes) folded into
  * a persistent snapshot via foreachBatch running Snapshot.merge — the
  * micro-batch materialized-view maintenance loop. The final state must
  * equal applying the same changelog in ONE batch merge. */
class StreamingCdcSpec extends SparkSpecBase {
  import spark.implicits._

  test("foreachBatch merge over a changelog stream equals one batch merge") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_state").toString
    val state0 = Seq((1L, 10, false), (2L, 20, false), (3L, 30, false))
      .toDF("id", "v", "is_delete").drop("is_delete")
    state0.write.mode(SaveMode.Overwrite).parquet(dir)

    // changelog: update 1, delete 2, insert 4 — across two micro-batches,
    // each batch free of same-id multi-matches (the merge contract)
    val batch1 = Seq((1L, 11, false), (2L, 0, true))
    val batch2 = Seq((4L, 40, false), (1L, 12, false))

    val stream = MemoryStream[(Long, Int, Boolean)]
    val q = stream.toDF().toDF("id", "v", "is_delete")
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        // materialize the merged state BEFORE overwriting the directory it
        // reads from (tiny in tests; at scale: write tmp dir + atomic move)
        val cur = spark.read.parquet(dir)
        val next = Snapshot.merge(cur, batch, "id").collect()
        spark.createDataFrame(spark.sparkContext.parallelize(next.toSeq), cur.schema)
          .write.mode(SaveMode.Overwrite).parquet(dir)
      }.start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    // one-shot equivalent: fold both batches sequentially in batch mode
    val oneShot = Seq(batch1, batch2).foldLeft(state0) { (st, b) =>
      Snapshot.merge(st, b.toDF("id", "v", "is_delete"), "id")
    }.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(streamed == oneShot)
    assert(streamed == Set((1L, 12), (3L, 30), (4L, 40)))
  }
}
