package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._

class TwoLevelAssignSpec extends SparkSpecBase {
  import spark.implicits._

  private val dim = 16
  private lazy val vecs = {
    val rnd = new scala.util.Random(23)
    (0 until 600).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
  }

  test("codebook build is deterministic and ragged-safe") {
    val (c1, f1) = Ann.twoLevelCodebook(vecs, kc = 7, kf = 5)
    val (c2, f2) = Ann.twoLevelCodebook(vecs, kc = 7, kf = 5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(f1.map(_.map(_.toSeq).toSeq).toSeq == f2.map(_.map(_.toSeq).toSeq).toSeq)
    assert(c1.length == 7)
    assert(f1.forall(fc => fc.nonEmpty && fc.length <= 5))
  }

  test("probes = kc equals the flat argmin over the flattened codebook (tie-free data)") {
    val (coarse, fine) = Ann.twoLevelCodebook(vecs, kc = 6, kf = 4)
    val flat = fine.flatten
    val two = Ann.assignTwoLevel(vecs, coarse, fine, probes = coarse.length)
      .select(col("vec_id"), col("ivf_cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val flatAssign = Ann.assign(vecs, flat)
      .select(col("vec_id"), col("ivf_cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(two == flatAssign)
  }

  test("probes = 1 is deterministic, in-range, and matches an eval-mode replay") {
    val (coarse, fine) = Ann.twoLevelCodebook(vecs, kc = 6, kf = 4)
    val offsets = fine.scanLeft(0)(_ + _.length).init
    val nCells = fine.map(_.length).sum
    val got = Ann.assignTwoLevel(vecs, coarse, fine, probes = 1)
      .select(col("vec_id"), col("ivf_cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.forall(c => c >= 0 && c < nCells))
    // driver replay: nearest coarse (ties to lower index), then argmin of
    // that cell's fine codebook — pins codegen == interpreted semantics
    val rows = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    rows.foreach { case (id, v) =>
      val ci = coarse.indices.minBy(c => (d2(v, coarse(c)), c))
      val fj = fine(ci).indices.minBy(j => (d2(v, fine(ci)(j)), j))
      assert(got(id) == offsets(ci) + fj, s"row $id")
    }
  }

  test("assignment cost argument: probed work is a fraction of the flat loop") {
    // structural, not timed: with kc=32, kf=32 (1024 cells), probes=2 the
    // per-row distance evaluations are 32 + 2*32 = 96 vs 1024 flat — the
    // expression's loop bounds are (kc, probes, |fine_c|) by construction;
    // assert the codebook shape that realizes it
    val (coarse, fine) = Ann.twoLevelCodebook(vecs, kc = 32, kf = 16)
    assert(coarse.length == 32)
    assert(fine.map(_.length).sum <= 32 * 16)
    val out = Ann.assignTwoLevel(vecs, coarse, fine, probes = 2)
      .groupBy("ivf_cell").count().count()
    assert(out > 32, "two-level assignment should spread rows beyond the coarse cells")
  }
}
