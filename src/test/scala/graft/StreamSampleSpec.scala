package graft

import graft.streaming.StreamSample
import graft.streaming.StreamSample.Cand
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Bounded per-key A-ES priority sampling: the batch aggregator form, the
  * window-rank reference formulation, and the streaming state form must
  * all select the identical sample — and the streaming form must do so
  * under ANY arrival order (the priority is a pure row function, so the
  * sample is a function of the set, not the sequence).
  */
class StreamSampleSpec extends SparkSpecBase {
  import spark.implicits._

  private val R = 10

  private lazy val fixture = (0 until 200).map { i =>
    (i.toLong, s"src_${i % 4}", 0.2 + (i % 7) * 0.2)
  }.toDF("doc_id", "key", "w")

  private lazy val batchResult =
    StreamSample.prioritySample(fixture, col("key"), col("doc_id"), col("w"), R)
      .orderBy(col("key"), col("rank"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq

  test("batch sample equals the window row_number formulation") {
    val win = fixture
      .select(col("key"), col("doc_id"),
        StreamSample.esPriority(col("doc_id"), col("w")).as("pri"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("pri").asc, col("doc_id").asc)))
      .filter(col("rank") <= R)
      .select(col("key"), col("rank"), col("doc_id"), col("pri"))
      .orderBy(col("key"), col("rank"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(batchResult === win)
    assert(batchResult.map(_._1).distinct.size === 4)
  }

  test("streaming state form equals batch under any arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val cands = fixture
      .select(col("key").as("k"), col("doc_id").as("i"),
        StreamSample.esPriority(col("doc_id"), col("w")).as("pri"))
      .as[Cand].collect().toSeq
    val rnd = new scala.util.Random(97)
    val orders = Seq(cands.sortBy(_.i), cands.sortBy(-_.i), rnd.shuffle(cands))
    orders.zipWithIndex.foreach { case (ord, oi) =>
      val stream = MemoryStream[Cand]
      val name = s"psample_out_$oi"
      val q = StreamSample.prioritySampleStreaming(stream.toDS(), R)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      try {
        ord.grouped(math.max(1, ord.size / 3 + 1)).foreach { chunk =>
          stream.addData(chunk); q.processAllAvailable()
        }
      } finally q.stop()
      val lastVer = Window.partitionBy(col("key"))
      val streamed = spark.table(name)
        .withColumn("maxv", max(col("ver")).over(lastVer))
        .filter(col("ver") === col("maxv"))
        .select(col("key"), posexplode(arrays_zip(col("ids"), col("pris"))))
        .select(col("key"), (col("pos") + 1).cast("int").as("rank"),
          col("col.ids").as("doc_id"), col("col.pris").as("es_key"))
        .orderBy(col("key"), col("rank"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(streamed === batchResult, s"arrival order $oi diverged from batch")
    }
  }

  test("state stays bounded at R per key and a low-priority straggler changes nothing") {
    implicit val sqlCtx = spark.sqlContext
    val byKey = batchResult.groupBy(_._1)
    // straggler: worse (higher) priority than every admitted row of its key
    val worstAdmitted = byKey("src_1").map(_._4).max
    val straggler = Cand("src_1", 9999L, worstAdmitted + 100.0)
    val cands = fixture
      .select(col("key").as("k"), col("doc_id").as("i"),
        StreamSample.esPriority(col("doc_id"), col("w")).as("pri"))
      .as[Cand].collect().toSeq
    val stream = MemoryStream[Cand]
    val q = StreamSample.prioritySampleStreaming(stream.toDS(), R)
      .writeStream.format("memory").queryName("psample_straggler")
      .outputMode(OutputMode.Update()).start()
    try {
      stream.addData(cands); q.processAllAvailable()
      stream.addData(Seq(straggler)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("psample_straggler")
      .filter(col("key") === "src_1").orderBy(col("ver").desc).collect()
    val latest = rows.head
    assert(latest.getSeq[Long](2).size === R)
    assert(!latest.getSeq[Long](2).contains(9999L))
    // ver bumped but the sample itself is unchanged from the previous state
    assert(rows(0).getSeq[Long](2) === rows(1).getSeq[Long](2))
    assert(rows(0).getSeq[Double](3) === rows(1).getSeq[Double](3))
  }
}
