package graft

import graft.core.Fixtures
import graft.operators.LateInteraction
import org.apache.spark.sql.functions._

/** MaxSim late-interaction scoring: the Column expression must equal a
  * driver-side brute-force computation of Σ_i max_j round(dot(q_i,d_j),9)
  * over the packed sub-vectors, and degenerate nSub=1 must reduce to the
  * plain (rounded) dot product. */
class LateInteractionSpec extends SparkSpecBase {
  import Fixtures.Q64

  private def bruteMaxSim(v: Array[Float], q: Array[Double], nSub: Int): Double = {
    val w = q.length / nSub
    (0 until nSub).map { i =>
      (0 until nSub).map { j =>
        var s = 0.0; var t = 0
        while (t < w) { s += v(j * w + t).toDouble * q(i * w + t); t += 1 }
        BigDecimal(s).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.max
    }.sum
  }

  test("maxSimLit equals driver-side brute force on the fixture corpus") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        col("embedding"),
        LateInteraction.maxSimLit(col("embedding"), Q64, 4).as("maxsim"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val expected = bruteMaxSim(v, Q64, 4)
      assert(math.abs(r.getDouble(2) - expected) < 1e-12,
        s"vec_id=${r.getLong(0)}: got ${r.getDouble(2)}, want $expected")
    }
  }

  test("nSub=1 reduces to the rounded full dot product") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 20)
      .select(
        LateInteraction.maxSimLit(col("embedding"), Q64, 1).as("m"),
        round(graft.functions.Distances.dotLit(col("embedding"), Q64), 9).as("d"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("maxSimCols nSub=1 reduces to the rounded col-vs-col dot") {
    import graft.functions.Distances
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(30)
      .select(col("vec_id"), col("embedding"))
    val pairs = df.as("a").crossJoin(df.as("b")).limit(200)
      .select(
        LateInteraction.maxSimCols(col("a.embedding"), col("b.embedding"), 64, 1).as("m"),
        round(Distances.dotCols(col("a.embedding"), col("b.embedding"), 64), 9).as("d"))
    pairs.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
    }
  }

  test("fused maxSimCols kernel == the unrolled-Column formulation, bit for bit") {
    import spark.implicits._
    // random pairs incl. negative components (exercises HALF_UP away-from-
    // zero on negative dots) across several (dim, nSub) shapes
    val rnd = new scala.util.Random(41)
    for ((dim, nSub) <- Seq((64, 4), (64, 8), (16, 2), (8, 1))) {
      val rows = (0 until 60).map { i =>
        (i.toLong,
          Array.fill(dim)((rnd.nextGaussian() * 0.4).toFloat),
          Array.fill(dim)((rnd.nextGaussian() * 0.4).toFloat))
      }
      val df = rows.toDF("id", "qv", "dv")
      val got = df.select(col("id"),
          LateInteraction.maxSimCols(col("qv"), col("dv"), dim, nSub).as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = df.select(col("id"),
          LateInteraction.maxSimColsUnrolled(col("qv"), col("dv"), dim, nSub).as("m"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.foreach { case (id, _, _) =>
        assert(java.lang.Double.doubleToLongBits(got(id)) ===
          java.lang.Double.doubleToLongBits(want(id)),
          s"dim=$dim nSub=$nSub id=$id: ${got(id)} vs ${want(id)}")
      }
    }
  }

  test("maxSimCols null contract: null array, short array, null element all score NULL") {
    // STRICTER than the pre-r10 unrolled form (which partially evaluated
    // malformed rows via element_at/greatest null-skipping) — malformed
    // vectors must surface as null scores, never a silent partial prefix
    import spark.implicits._
    val good = Array.tabulate(8)(i => 0.1f * (i + 1))
    val rows = Seq(
      (1L, Some(good.toSeq.map(Option(_)))),                         // well-formed
      (2L, None),                                                    // null array
      (3L, Some(good.take(5).toSeq.map(Option(_)))),                 // shorter than dim
      (4L, Some(good.toSeq.map(Option(_)).updated(3, None)))         // null element
    ).toDF("id", "v")
    val q = good.map(_.toDouble)
    val out = rows.select(col("id"),
        LateInteraction.maxSimCols(
          typedLit(q.map(_.toFloat)), col("v"), dim = 8, nSub = 2).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty && out(3L).isEmpty && out(4L).isEmpty)
  }

  test("prefix squared-L2 is a lower bound of the full distance (Matryoshka monotonicity)") {
    import graft.functions.Distances
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 200)
      .select(
        Distances.squaredL2Lit(col("embedding"), Q64).as("full"),
        Distances.squaredL2Lit(col("embedding"), Q64.take(16)).as("prefix"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(0) + 1e-12)
    }
  }
}
