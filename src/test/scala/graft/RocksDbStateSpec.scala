package graft

import graft.streaming.{Sessionize, StateStores, StreamSketch}
import graft.streaming.Sessionize.StreamEv
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}
import scala.jdk.CollectionConverters._

/** The stateful streaming operators on RocksDBStateStoreProvider — the
  * 100 TB keyed-state path (the default HDFS-backed store holds every
  * key's state on the executor heap; see [[graft.streaming.StateStores]]).
  * Pins (a) the provider REALLY engaged (rocksdb* metrics in the query
  * progress) and (b) results are bit-identical to the default provider
  * for the three state shapes: flatMapGroupsWithState sessionization,
  * KMV sketch maintenance, top-k leaderboard maintenance. */
class RocksDbStateSpec extends SparkSpecBase {
  import spark.implicits._

  /** Drains a started query over the given batches, asserts RocksDB state
    * metrics appeared in its progress, returns the memory-sink rows. */
  private def runToMemory[A](stream: MemoryStream[A], q: StreamingQuery,
      table: String, batches: Seq[Seq[A]], expectRocks: Boolean): Seq[org.apache.spark.sql.Row] = {
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      val metricKeys = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
        .flatMap(_.customMetrics.keySet().asScala)
      assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")) == expectRocks,
        s"state metrics $table: ${metricKeys.distinct.sorted.mkString(",")}")
    } finally q.stop()
    spark.table(table).collect().toSeq
  }

  test("sessionization state on RocksDB: provider engages, sessions equal the default provider's") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1700000000L * 1000L
    def ev(user: Long, id: Long, offMin: Long) =
      StreamEv(user, id, new Timestamp(base + offMin * 60000L), 1.0)
    // 3 users, each with 2 gap-separated sessions; sentinel advances the
    // watermark far enough to close everything (the SessionizeSpec device)
    // time-ordered feed (MemoryStream batches advance the watermark; an
    // out-of-order split would late-drop earlier users' events)
    val evs = (for (u <- 1L to 3L) yield Seq(
      ev(u, u * 100 + 1, u), ev(u, u * 100 + 2, u + 5),
      ev(u, u * 100 + 3, u + 90), ev(u, u * 100 + 4, u + 95)))
      .flatten.sortBy(_.ts.getTime)
    val sentinels = Seq(
      StreamEv(-1L, 9991L, new Timestamp(base + 86400L * 1000L), 0.0),
      StreamEv(-1L, 9992L, new Timestamp(base + 2 * 86400L * 1000L), 0.0))

    def run(name: String, rocks: Boolean): Seq[(Long, Long, Long, Long, Long, Double)] = {
      val stream = MemoryStream[StreamEv]
      def start() = Sessionize.streaming(stream.toDS(), gapMinutes = 30)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      val q = if (rocks) StateStores.withRocksDb(spark)(start()) else start()
      runToMemory(stream, q, name,
          Seq(evs.take(6), evs.drop(6), sentinels.take(1), sentinels.drop(1)),
          expectRocks = rocks)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5)))
        .filter(_._1 >= 0).sortBy(t => (t._1, t._2))
    }
    val rocks = run("rocks_sess", rocks = true)
    val default = run("default_sess", rocks = false)
    assert(rocks == default)
    assert(rocks.size == 6) // 3 users x 2 sessions
  }

  test("KMV sketch + top-k state on RocksDB equal the default provider") {
    implicit val sqlCtx = spark.sqlContext
    val kmvRows = (1 to 400).map(i => (s"k${i % 3}", s"v${i % 57}"))
    def runKmv(name: String, rocks: Boolean) = {
      val stream = MemoryStream[(String, String)]
      def start() = StreamSketch.kmvDistinctStreaming(
          stream.toDF().toDF("key", "value"), "key", "value", k = 16)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      val q = if (rocks) StateStores.withRocksDb(spark)(start()) else start()
      runToMemory(stream, q, name,
          Seq(kmvRows.take(150), kmvRows.slice(150, 300), kmvRows.drop(300)),
          expectRocks = rocks)
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    }
    // Update-mode memory sink appends every emission; the FINAL per-key
    // row (last occurrence) is the state summary to compare
    def finalByKey(rows: Seq[(String, Long, Long, Double)]) =
      rows.zipWithIndex.groupBy(_._1._1).map { case (k, vs) => k -> vs.maxBy(_._2)._1 }
    assert(finalByKey(runKmv("rocks_kmv", rocks = true)) ==
      finalByKey(runKmv("default_kmv", rocks = false)))

    val topRows = (1 to 300).map(i => (s"g${i % 2}", (i % 40).toLong, (i % 23).toDouble))
    def runTop(name: String, rocks: Boolean) = {
      val stream = MemoryStream[(String, Long, Double)]
      def start() = StreamSketch.topKStreaming(
          stream.toDF().toDF("key", "id", "score"), "key", "id", "score", k = 5)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      val q = if (rocks) StateStores.withRocksDb(spark)(start()) else start()
      runToMemory(stream, q, name, Seq(topRows.take(100), topRows.drop(100)),
          expectRocks = rocks)
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    }
    def lastRanks(rows: Seq[(String, Long, Double, Int)]) =
      rows.zipWithIndex.groupBy(t => (t._1._1, t._1._4))
        .map { case (kr, vs) => kr -> vs.maxBy(_._2)._1 }
    assert(lastRanks(runTop("rocks_top", rocks = true)) ==
      lastRanks(runTop("default_top", rocks = false)))
  }
}
