package graft

import graft.operators.Freq
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming count-min maintenance: the per-batch sketch deltas folded
  * into the persisted sketch must equal the one-shot sketch of everything
  * ingested — the monoid property that lets a token-frequency monitor run
  * on the stream without ever rescanning the corpus. */
class StreamingCmsSpec extends SparkSpecBase {
  import spark.implicits._

  test("streamed count-min fold equals one-shot sketch; estimates agree") {
    implicit val sqlCtx = spark.sqlContext
    val sketchDir = "target/tmp/cms_sketch/sketch"
    val root = new java.io.File("target/tmp/cms_sketch")
    if (root.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }

    val batch1 = Seq("a", "b", "a", "c")
    val batch2 = Seq("a", "d", "d")
    val batch3 = Seq("b", "a", "e", "a")

    val stream = MemoryStream[String]
    val q = StreamingIngest.countMinMaintain(
      stream.toDF().toDF("k"), "k", depth = 4, width = 64, sketchDir).start()
    try {
      stream.addData(batch1); q.processAllAvailable()
      stream.addData(batch2); q.processAllAvailable()
      stream.addData(batch3); q.processAllAvailable()
    } finally q.stop()

    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Long]("cell")) -> r.getAs[Long]("n"))
      .toMap
    val streamed = cells(spark.read.parquet(sketchDir))
    val oneShot = cells(Freq.countMinSketch(
      (batch1 ++ batch2 ++ batch3).toDF("k"), "k", depth = 4, width = 64))
    assert(streamed === oneShot)

    // estimates off the streamed sketch match exact counts (width 64 is
    // collision-free for 5 distinct keys with overwhelming likelihood;
    // >= is the guaranteed bound either way)
    val exact = (batch1 ++ batch2 ++ batch3).toDF("k")
      .groupBy("k").agg(count(lit(1)).as("exact_n"))
    val est = Freq.countMinLookup(spark.read.parquet(sketchDir), exact, "k",
        depth = 4, width = 64)
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("exact_n"), r.getAs[Long]("cm_est"))).toMap
    est.values.foreach { case (ex, cm) => assert(cm >= ex) }
    assert(est("a")._1 === 5L)
  }
}
