package graft

import graft.core.Fixtures
import graft.functions.Distances
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Native loop expressions (VecMetricLit/Cols) must be bit-identical to
  * the unrolled Column forms — same left-to-right IEEE accumulation — on
  * real fixture vectors. This is the in-suite guard behind the DuckDB
  * oracle parity of every distance-based query. */
class VecExprSpec extends SparkSpecBase {
  import Fixtures.{Dim, InvDiag64, Q64}

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def assertBitEqual(df: DataFrame, a: Column, b: Column, name: String): Unit = {
    val bad = df.select(a.as("x"), b.as("y"))
      .filter(col("x") =!= col("y") ||
        col("x").isNull =!= col("y").isNull)
      .count()
    assert(bad == 0, s"$name: $bad rows differ between native and unrolled")
  }

  test("lit metrics: native == unrolled bit-for-bit on fixture vectors") {
    val v = col("embedding")
    assertBitEqual(emb, Distances.squaredL2Lit(v, Q64),
      Distances.squaredL2LitUnrolled(v, Q64), "squaredL2Lit")
    assertBitEqual(emb, Distances.l1Lit(v, Q64),
      Distances.l1LitUnrolled(v, Q64), "l1Lit")
    assertBitEqual(emb, Distances.lInfLit(v, Q64),
      Distances.lInfLitUnrolled(v, Q64), "lInfLit")
    assertBitEqual(emb, Distances.mahalanobisDiagLit(v, Q64, InvDiag64),
      Distances.mahalanobisDiagLitUnrolled(v, Q64, InvDiag64), "mahalanobisDiagLit")
    assertBitEqual(emb, Distances.cosineSimLit(v, Q64),
      Distances.cosineSimLitUnrolled(v, Q64), "cosineSimLit")
  }

  test("cols metrics: native == unrolled bit-for-bit on fixture pairs") {
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")),
        col("ia") % 7 === col("ib") % 7 && col("ia") < col("ib"))
      .limit(5000)
    assertBitEqual(pairs,
      Distances.squaredL2Cols(col("va"), col("vb"), Dim),
      Distances.squaredL2ColsUnrolled(col("va"), col("vb"), Dim), "squaredL2Cols")
    assertBitEqual(pairs,
      Distances.cosineSimCols(col("va"), col("vb"), Dim),
      Distances.cosineSimColsUnrolled(col("va"), col("vb"), Dim), "cosineSimCols")
  }

  test("full-covariance mahalanobis: codegen equals driver-side loop bit-for-bit") {
    import Fixtures.InvFull8
    val q8 = Q64.take(8)
    val rows = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 8).as("e8"))
      .withColumn("d", Distances.mahalanobisFullLit(col("e8"), q8, InvFull8))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val expected = Distances.mahalanobisFull(v, q8, InvFull8)
      assert(r.getDouble(2) == expected, s"vec ${r.getLong(0)}")
    }
    // SPD: distance to self is 0, to others > 0
    val self = Distances.mahalanobisFull(q8, q8, InvFull8)
    assert(self == 0.0)
  }

  test("invertSPD: M * M^-1 == I within tolerance; pipeline with mahalanobisFull is sane") {
    val n = 6
    val rnd = new scala.util.Random(3)
    val a = Array.fill(n, n)(rnd.nextGaussian())
    // SPD: A'A + I
    val m = Array.tabulate(n * n) { k =>
      val (i, j) = (k / n, k % n)
      (0 until n).map(r => a(r)(i) * a(r)(j)).sum + (if (i == j) 1.0 else 0.0)
    }
    val inv = Distances.invertSPD(m, n)
    for (i <- 0 until n; j <- 0 until n) {
      val prod = (0 until n).map(k => m(i * n + k) * inv(k * n + j)).sum
      assert(math.abs(prod - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j)=$prod")
    }
    // d' Sinv d with the true inverse: positive for d != 0
    val d1 = Array.fill(n)(rnd.nextGaussian())
    val zero = new Array[Double](n)
    assert(Distances.mahalanobisFull(d1, zero, inv) > 0.0)
  }

  test("null handling: short array and null element yield null") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array.fill(Dim)(0.1f))),
      (2L, Some(Array.fill(Dim - 1)(0.1f))), // short
      (3L, None)                             // null array
    ).toDF("id", "embedding")
    val out = df.select(col("id"), Distances.squaredL2Lit(col("embedding"), Q64).as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L) && out(3L))
  }

  test("dynamic-dim fallbacks (zip_with/aggregate) equal the fixed-dim native forms") {
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")),
        col("ia") + 1 === col("ib"))
    assertBitEqual(pairs,
      Distances.squaredL2Dyn(col("va"), col("vb")),
      Distances.squaredL2Cols(col("va"), col("vb"), Dim), "squaredL2Dyn")
    assertBitEqual(pairs,
      Distances.l1Dyn(col("va"), col("vb")),
      Distances.l1Cols(col("va"), col("vb"), Dim), "l1Dyn")
    assertBitEqual(pairs,
      Distances.lInfDyn(col("va"), col("vb")),
      Distances.lInfCols(col("va"), col("vb"), Dim), "lInfDyn")
  }

  test("interpreted eval matches codegen (eval through filter on literal row)") {
    // Forcing the interpreted path: evaluate via Dataset.filter on a
    // non-codegen context is brittle; instead compare eval() directly.
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.{VecMetric, VecMetricLit}
    val vec = Array.tabulate(Dim)(i => (0.01f * i) - 0.3f)
    val arr = ArrayData.toArrayData(vec)
    val row = org.apache.spark.sql.catalyst.InternalRow(arr)
    val ref = BoundReference(0, ArrayType(FloatType), nullable = true)
    val expected = {
      var s = 0.0
      vec.indices.foreach { i => val d = vec(i).toDouble - Q64(i); s += d * d }
      s
    }
    val got = VecMetricLit(ref, VecMetric.SqL2, Q64).eval(row).asInstanceOf[Double]
    assert(got == expected)
  }

  test("cosine codegen survives NaN / overflowing query norms (no Janino fallback)") {
    // Pre-fix, qNorm was embedded as a decimal literal: "NaN"/"Infinity" is
    // invalid Java, and the silent whole-stage fallback hid it. With
    // fallback disabled a compile failure aborts the query instead.
    import spark.implicits._
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((1L, Array.fill(Dim)(0.5f))).toDF("id", "embedding")
      val qNaN = Array.tabulate(Dim)(i => if (i == 0) Double.NaN else 0.1)
      val qInf = Array.fill(Dim)(1e200) // norm overflows to Infinity
      val out = df.select(
          Distances.cosineSimLit(col("embedding"), qNaN).as("a"),
          Distances.cosineSimLit(col("embedding"), qInf).as("b"))
        .head()
      assert(out.getDouble(0).isNaN)                       // x / (norm * NaN)
      assert(out.getDouble(1) == 0.0 || out.getDouble(1).isNaN) // finite/Inf
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("VecMinDistL2 equals least() over unrolled per-centroid sums, bit-for-bit") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val cents = Array.fill(7)(Array.fill(4)(rnd.nextDouble() - 0.5))
    val df = (0 until 200).map { _ =>
      Tuple1(Array.fill(4)(rnd.nextFloat() - 0.5f))
    }.toDF("v")
    def unrolled = least(cents.map { c =>
      c.indices.map { i =>
        val d = element_at(col("v"), i + 1).cast("double") - lit(c(i)); d * d
      }.reduce(_ + _)
    }.toSeq: _*)
    val native = ColumnBridge.column(
      graft.functions.VecMinDistL2(ColumnBridge.expression(col("v")), cents))
    val rows = df.select(native.as("a"), unrolled.as("b")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // short vector -> null, matching the metric expressions' contract
    val shortV = Seq(Tuple1(Array(0.1f))).toDF("v")
      .select(ColumnBridge.column(graft.functions.VecMinDistL2(
        ColumnBridge.expression(col("v")), cents)).as("a")).head()
    assert(shortV.isNullAt(0))
  }

  test("VecMetricCols rejects metrics needing weights at construction") {
    import graft.functions.{VecMetric, VecMetricCols}
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val a = BoundReference(0, ArrayType(FloatType), nullable = true)
    val b = BoundReference(1, ArrayType(FloatType), nullable = true)
    intercept[IllegalArgumentException] { VecMetricCols(a, b, VecMetric.Maha, 4) }
    intercept[IllegalArgumentException] { VecMetricCols(a, b, VecMetric.MahaFull, 4) }
  }
}
