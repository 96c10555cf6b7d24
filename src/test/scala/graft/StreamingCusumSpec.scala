package graft

import graft.streaming.StreamMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CUSUM maintenance: the fold state carried across ordered
  * micro-batches must equal the one-shot fold over the concatenated
  * series (left-fold continuation), and the batch `aggregate` expression
  * used by the declared events_cusum_daily query must agree with the
  * driver fold on the same deltas. */
class StreamingCusumSpec extends SparkSpecBase {
  import spark.implicits._

  private val mean = 10.0
  private val b1 = Seq(("2024-01-01", 12L), ("2024-01-02", 7L))
  private val b2 = Seq(("2024-01-03", 25L), ("2024-01-04", 9L))
  private val b3 = Seq(("2024-01-05", 3L), ("2024-01-06", 30L), ("2024-01-07", 11L))

  test("streamed fold across ordered batches equals the one-shot fold") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = "target/tmp/cusum_state/state"
    val root = new java.io.File("target/tmp/cusum_state")
    if (root.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(root)
    }

    val stream = MemoryStream[(String, Long)]
    val q = StreamMonitor.cusumMaintain(
      stream.toDF().toDF("day", "n"), "day", "n", mean, stateDir).start()
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(b3); q.processAllAvailable()
    } finally q.stop()

    val st = spark.read.parquet(stateDir).collect()(0)
    val all = (b1 ++ b2 ++ b3).map(_._2.toDouble - mean)
    val (c, m) = StreamMonitor.cusumFold(0.0, 0.0, all)
    assert(st.getAs[Double]("cusum") == c)
    assert(st.getAs[Double]("max_cusum") == m)
    assert(m > 0.0)
  }

  test("the batch aggregate-expression fold agrees with the driver fold") {
    val all = (b1 ++ b2 ++ b3).map(_._2.toDouble - mean)
    val (_, m) = StreamMonitor.cusumFold(0.0, 0.0, all)
    val viaExpr = spark.range(1).select(
      element_at(aggregate(
        typedLit(all),
        array(lit(0.0), lit(0.0)),
        (acc, x) => {
          val c = greatest(lit(0.0), element_at(acc, 1) + x)
          array(c, greatest(element_at(acc, 2), c))
        }), 2).as("m")).head().getDouble(0)
    assert(viaExpr == m)
  }
}
