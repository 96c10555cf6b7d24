package graft

import graft.operators.OrderStat
import org.apache.spark.sql.functions._

/** Exact rank-k selection by bucket-count bisection: must equal the
  * sorted-collect reference on every k, under ties, clustering, and a
  * collect threshold small enough to force multiple bisection levels.
  */
class OrderStatSpec extends SparkSpecBase {
  import spark.implicits._

  private def check(values: Seq[Double], ks: Seq[Long], threshold: Long = 8L): Unit = {
    val df = values.toDF("x")
    val sorted = values.sorted
    ks.foreach { k =>
      val got = OrderStat.kthSmallest(df, col("x"), k, collectThreshold = threshold)
      val exp = if (k >= 1 && k <= sorted.size) Some(sorted(k.toInt - 1)) else None
      assert(got === exp, s"k=$k over ${values.size} values")
    }
  }

  test("random values with heavy ties match sorted-collect at every probed rank") {
    val rnd = new scala.util.Random(31)
    val values = Seq.fill(500)(rnd.nextInt(40).toDouble / 4.0)
    check(values, Seq(1L, 2L, 250L, 251L, 499L, 500L, 501L))
  }

  test("tightly clustered values force deep range narrowing and stay exact") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(300)(1.0 + rnd.nextInt(5).toDouble * 1e-12) ++
      Seq(1e9, -1e9)
    check(values, Seq(1L, 2L, 151L, 301L, 302L))
  }

  test("all-equal column short-circuits; empty and out-of-range yield None") {
    check(Seq.fill(100)(42.5), Seq(1L, 50L, 100L))
    assert(OrderStat.kthSmallest(Seq.empty[Double].toDF("x"), col("x"), 1L) === None)
    assert(OrderStat.kthSmallest(Seq(1.0, 2.0).toDF("x"), col("x"), 3L) === None)
  }

  test("nulls are excluded from ranking") {
    val df = Seq[Option[Double]](Some(3.0), None, Some(1.0), Some(2.0), None)
      .toDF("x")
    assert(OrderStat.kthSmallest(df, col("x"), 2L) === Some(2.0))
    assert(OrderStat.kthSmallest(df, col("x"), 4L) === None)
  }

  test("weighted selection matches a cumulative-walk reference incl. ties and w=0 exclusion") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.fill(400)((rnd.nextInt(25).toDouble / 2.0, rnd.nextInt(5).toLong))
    val df = rows.toDF("x", "w")
    val kept = rows.filter(_._2 > 0L).sortBy(_._1)
    val total = kept.map(_._2).sum
    def ref(target: Long): Option[Double] = {
      var cum = 0L
      kept.foreach { case (v, w) => cum += w; if (cum >= target) return Some(v) }
      None
    }
    Seq(1L, total / 3, (total + 1) / 2, total, total + 1).foreach { t =>
      val got = graft.operators.OrderStat.weightedRankSmallest(
        df, col("x"), col("w"), t, collectThreshold = 8)
      assert(got === ref(t), s"targetW=$t")
    }
  }

  test("unit weights reduce weighted selection to kthSmallest") {
    val rnd = new scala.util.Random(23)
    val values = Seq.fill(300)(rnd.nextDouble() * 100.0)
    val df = values.toDF("x").withColumn("w", lit(1L))
    Seq(1L, 150L, 300L).foreach { k =>
      assert(
        graft.operators.OrderStat.weightedRankSmallest(df, col("x"), col("w"), k, 8L) ===
          graft.operators.OrderStat.kthSmallest(values.toDF("x"), col("x"), k, 8L))
    }
  }

  test("fixture-scale median equals Spark's exact percentile on the same column") {
    val li = graft.core.Tables.lineitem(spark, sfDir).select(col("l_extendedprice"))
    val n = li.count()
    val med = OrderStat.kthSmallest(li, col("l_extendedprice"), (n + 1) / 2,
      collectThreshold = 64).get
    val sorted = li.orderBy(col("l_extendedprice").asc)
      .limit(((n + 1) / 2).toInt).collect()
    assert(med === sorted.last.getDouble(0))
  }
}
