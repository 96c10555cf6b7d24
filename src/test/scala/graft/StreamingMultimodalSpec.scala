package graft

import graft.core.Tables
import graft.index.GridConfig
import graft.multimodal.Multimodal
import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingMultimodalSpec extends SparkSpecBase {

  test("streaming ingest: micro-batch append lands cell-bucketed rows equal to batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graftstream").toString
    val src = s"$tmp/src"; val store = s"$tmp/store"; val ckpt = s"$tmp/ckpt"
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    emb.write.parquet(src)
    val stream = spark.readStream.schema(emb.schema).parquet(src)
    val cfg = SparkEntry.gridCfg
    val q = StreamingIngest.vectorIngest(stream, cfg, store)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stored = spark.read.parquet(store)
    assert(stored.count() === 100)
    assert(stored.columns.contains("cell_id"))
    // same bucketing as the batch index build
    val batchCells = graft.index.Grid.withCellId(emb, "embedding", cfg)
      .groupBy("cell_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamCells = stored.groupBy("cell_id").count().collect()
      .map(r => r.getAs[Number]("cell_id").longValue() -> r.getLong(1)).toMap
    assert(streamCells === batchCells)
  }

  test("windowed event stats with watermark runs as a stream and matches batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graftstream2").toString
    val events = Tables.events(spark, sfDir)
    events.write.parquet(s"$tmp/src")
    val stream = spark.readStream.schema(events.schema).parquet(s"$tmp/src")
    val agg = StreamingIngest.windowedEventStats(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", s"$tmp/ckpt").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("win_out")
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("multimodal: binary payload features are deterministic and complete") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    val feats = Multimodal.extractFeatures(media).cache()
    assert(feats.count() === 500)
    val r = feats.filter(col("media_id") === 0).collect()(0)
    assert(r.n_bytes > 0 && r.width >= 16 && r.height >= 16 && r.n_frames >= 1)
    // deterministic: second run identical
    val again = Multimodal.extractFeatures(media).filter(col("media_id") === 0).collect()(0)
    assert(again === r)
    // kinds partition by doc_id % 3
    assert(feats.filter(col("kind") === "video").count() > 0)
  }

  test("multimodal: media embedding feeds the similarity engine (dup payload = own NN at dist 0)") {
    // duplicate one payload under a fresh id — the byte-histogram embedding
    // must make it its own nearest neighbor through the standard kNN stack
    val docs = Tables.documents(spark, sfDir).limit(40)
    val media = Multimodal.mediaFromDocuments(docs)
      .unionByName(Multimodal.mediaFromDocuments(
        docs.filter(col("doc_id") === 3).withColumn("doc_id", lit(9999L))))
    val emb = Multimodal.embedMedia(media, dim = 64).toDF()
      .select(col("media_id").as("vec_id"), col("embedding"), lit(0).as("label"))
    assert(emb.count() == 41)
    val q = emb.filter(col("vec_id") === 9999L)
      .head().getSeq[Float](1).map(_.toDouble).toArray
    val top2 = graft.operators.Knn.bruteForce(emb,
        graft.functions.Distances.squaredL2Lit(col("embedding"), q), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(top2.map(_._1).toSet == Set(3L, 9999L), s"got ${top2.toSeq}")
    assert(top2.forall(_._2 == 0.0))
  }

  test("multimodal: exact dedup groups constructed duplicate payloads by digest") {
    // the driver fixture has no duplicate payloads (media_dedup_exact is
    // 0-row there), so exercise the digest/count/canonical path on
    // constructed duplicates: "alpha" x2 (ids 0,2), "beta" x3 (ids 1,4,5)
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha"), (1L, "beta"), (2L, "alpha"),
      (3L, "gamma"), (4L, "beta"), (5L, "beta")).toDF("doc_id", "text")
    val groups = Multimodal.dedupExactGroups(Multimodal.mediaFromDocuments(docs)).collect()
    assert(groups.length === 2)
    val byCanon = groups.map(r =>
      r.getAs[Long]("canonical_id") -> r.getAs[Long]("n_copies")).toMap
    assert(byCanon === Map(0L -> 2L, 1L -> 3L))
    // digest is md5 of the UTF-8 payload == DuckDB md5(text): oracle parity
    val md5Alpha = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(groups.map(_.getAs[String]("digest")).contains(md5Alpha))
  }

  test("multimodal: frame sampling plan only covers video with stride steps") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir).limit(30))
    val feats = Multimodal.extractFeatures(media)
    val plan = Multimodal.frameSamplePlan(feats, stride = 10)
    val rows = plan.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("frame_idx") % 10 === 0)
      assert(r.getAs[Int]("frame_idx") < r.getAs[Int]("n_frames"))
    }
  }
}
