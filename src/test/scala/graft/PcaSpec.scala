package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  test("power iteration recovers a planted dominant direction") {
    // vectors clustered along (0.6, 0.8, 0, 0) with small orthogonal noise
    val rows = (0 until 200).map { i =>
      val t = (i % 21 - 10) / 100.0f // deterministic "noise" in [-0.1, 0.1]
      (i.toLong, Array(0.6f + t * 0.8f, 0.8f - t * 0.6f, t, -t))
    }
    val df = rows.toDF("vec_id", "embedding")
    val v = Pca.topComponent(df, dims = 4, iters = 8)
      .orderBy("dim_idx").collect().map(_.getDouble(1))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12)
    // dominant direction ≈ ±(0.6, 0.8, 0, 0)
    val dot = v(0) * 0.6 + v(1) * 0.8
    assert(math.abs(math.abs(dot) - 1.0) < 0.02, s"got ${v.toSeq}")
  }

  test("gram matrix is symmetric and iteration is deterministic") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val g = Pca.gram(emb, dims = 8)
    for (i <- 0 until 8; j <- 0 until 8)
      assert(g(i)(j) == g(j)(i), s"asymmetry at ($i,$j)")
    val a = Pca.topComponent(emb, 8, 3).collect().map(_.getDouble(1)).toSeq
    val b = Pca.topComponent(emb, 8, 3).collect().map(_.getDouble(1)).toSeq
    assert(a == b)
    // more iterations converge: Rayleigh quotient is non-decreasing
    def rayleigh(v: Array[Double]) = {
      val w = (0 until 8).map(i => (0 until 8).map(j => g(i)(j) * v(j)).sum)
      (0 until 8).map(i => v(i) * w(i)).sum
    }
    val v3 = Pca.powerIterate(g, 3)
    val v6 = Pca.powerIterate(g, 6)
    assert(rayleigh(v6) >= rayleigh(v3) - 1e-9)
  }
}
