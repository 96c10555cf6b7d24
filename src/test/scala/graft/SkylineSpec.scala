package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpecBase {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, sx, sy) =>
        sx <= x && sy >= y && (sx < x || sy > y)
      }
    }.map(_._1).toSet

  test("randomized: window skyline equals brute-force dominance (with duplicates)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val base = Seq.tabulate(300)(i =>
        (i.toLong, rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      // inject exact duplicates — all copies of a frontier point survive
      val pts = base ++ base.take(10).map { case (id, x, y) => (id + 1000L, x, y) }
      val df = pts.toDF("id", "x", "y")
      val got = Skyline.pareto2d(df, col("x"), col("y"))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == brute(pts), s"trial $trial")
      val banded = Skyline.pareto2dBanded(df, col("x"), col("y"), bandWidth = 7L)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(banded == got, s"banded trial $trial")
    }
  }

  test("banded prefilter discards rows but never frontier points (fixture)") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("id"),
        round(col("o_totalprice") * 100).cast("long").as("x"),
        col("o_orderdate").cast("timestamp").cast("long").as("y"))
    val plain = Skyline.pareto2d(o, col("x"), col("y"))
      .select("id").collect().map(_.getLong(0)).toSet
    val banded = Skyline.pareto2dBanded(o, col("x"), col("y"), 100000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(banded == plain)
    assert(plain.nonEmpty && plain.size < o.count())
  }
}
