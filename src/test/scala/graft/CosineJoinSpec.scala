package graft

import graft.core.Tables
import graft.functions.Distances
import graft.operators.CosineJoin
import org.apache.spark.sql.functions._

class CosineJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dim = 64

  private def brute(vecs: org.apache.spark.sql.DataFrame, tau: Double) = {
    val a = vecs.select(col("vec_id").as("id_a"), col("embedding").as("_va"))
    val b = vecs.select(col("vec_id").as("id_b"), col("embedding").as("_vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Distances.cosineSimCols(col("_va"), col("_vb"), Dim).as("cos_sim"))
      .filter(col("cos_sim") >= lit(tau))
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e12))

  test("pairsExact == brute cross join for every tau/k combination (recall exactly 1)") {
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    for (tau <- Seq(0.1, 0.25, 0.5); k <- Seq(1, 3, 16)) {
      val got = CosineJoin.pairsExact(vecs, "vec_id", "embedding", Dim, tau, k)
        .collect().map(key).toSet
      val want = brute(vecs, tau).collect().map(key).toSet
      assert(got == want, s"tau=$tau k=$k: ${got.size} vs brute ${want.size}")
    }
  }

  test("clustered data: cell-pair pruning engages AND the result still equals brute") {
    // 3 tight clusters far apart on the sphere — the shape real-world
    // embeddings have (the isotropic fixture is the adversarial case where
    // no exact method can prune; here the admissible radius test must
    // actually drop most cell pairs).
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array.fill(Dim)(0.0).updated(0, 1.0),
      Array.fill(Dim)(0.0).updated(1, 1.0),
      Array.fill(Dim)(0.0).updated(2, 1.0))
    val rows = (0 until 300).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val tau = 0.5
    val got = CosineJoin.pairsExact(vecs, "vec_id", "embedding", Dim, tau, 12)
      .collect().map(key).toSet
    val want = brute(vecs, tau).collect().map(key).toSet
    assert(got == want, s"${got.size} vs brute ${want.size}")
    assert(want.nonEmpty, "degenerate test: no qualifying pairs")
    // with 3 well-separated clusters and eps=1, cross-cluster cell pairs
    // (angle 90°, distance sqrt(2) ≈ 1.41 > eps + tiny radii) must be
    // pruned: the candidate volume the equi-join feeds to the verifier has
    // to be far below the unblocked n(n−1)/2
    val n = rows.size.toLong
    val cand = CosineJoin.candidates(vecs, "vec_id", "embedding", Dim, tau, 12).count()
    assert(cand < n * (n - 1) / 2 / 2,
      s"pruning ineffective on clustered data: $cand candidates vs unblocked ${n * (n - 1) / 2}")
  }

  test("zero-norm vectors do not poison cell radii (NaN-pruning regression)") {
    // A zero vector's cosine to its seed is NaN; before the nanvl clamp
    // the containing cell's radius became NaN, dij <= eps + NaN + rj was
    // false for every pair, and that cell's qualifying pairs were silently
    // pruned — breaking the recall-exactly-1 contract.
    val rnd = new scala.util.Random(23)
    val rows = (0 until 60).map { i =>
      val v = if (i % 7 == 0) Array.fill(Dim)(0.0f)
              else Array.fill(Dim)(rnd.nextGaussian().toFloat)
      (i.toLong, v)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    for (tau <- Seq(0.1, 0.5); k <- Seq(3, 8)) {
      val got = CosineJoin.pairsExact(vecs, "vec_id", "embedding", Dim, tau, k)
        .collect().map(key).toSet
      val want = brute(vecs, tau).collect().map(key).toSet
      assert(got == want, s"tau=$tau k=$k: ${got.size} vs brute ${want.size}")
      assert(want.nonEmpty, s"degenerate trial tau=$tau")
    }
  }

  test("randomized property: exactness holds across random data, tau, and k (20 trials)") {
    val rnd = new scala.util.Random(101)
    for (trial <- 0 until 20) {
      val n = 20 + rnd.nextInt(120)
      // mix of regimes: isotropic, clustered, and near-duplicate-heavy
      val mode = trial % 3
      val rows = (0 until n).map { i =>
        val v = mode match {
          case 0 => Array.fill(Dim)(rnd.nextGaussian().toFloat)
          case 1 =>
            val c = Array.fill(Dim)(0.0f).updated(i % 4, 1.0f)
            c.map(x => x + (rnd.nextGaussian() * 0.05).toFloat)
          case _ =>
            val base = Array.fill(Dim)((i / 5).toFloat + 1f)
            base.updated(0, base(0) + rnd.nextFloat() * 0.01f)
        }
        // sparse, shuffled ids — exercise uneven strata
        (i.toLong * 7 + (i % 3), v)
      }
      val vecs = rows.toDF("vec_id", "embedding")
      val tau = -0.5 + rnd.nextDouble() * 1.4 // [-0.5, 0.9]
      val k = 1 + rnd.nextInt(20)
      val got = CosineJoin.pairsExact(vecs, "vec_id", "embedding", Dim, tau, k)
        .collect().map(key).toSet
      val want = brute(vecs, tau).collect().map(key).toSet
      assert(got == want, s"trial=$trial mode=$mode n=$n tau=$tau k=$k: ${got.size} vs ${want.size}")
    }
  }

  test("VecMaxCosLit equals the greatest-of-unrolled-cosines form bit-for-bit") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val rnd = new scala.util.Random(31)
    val vecs = (0 until 200).map(i => (i.toLong, Array.fill(Dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val qs = Array.fill(7)(Array.fill(Dim)(rnd.nextGaussian() * 0.5))
    val fused = ColumnBridge.column(graft.functions.VecMaxCosLit(
      ColumnBridge.expression(col("embedding")), qs))
    val unrolled = greatest(qs.map(q =>
      Distances.cosineSimLit(col("embedding"), q)).toSeq: _*)
    val diff = vecs.select((fused === unrolled).as("eq")).filter(!col("eq")).count()
    assert(diff == 0, s"$diff rows diverge from the unrolled form")
  }

  test("plan is an equi-join: no BroadcastNestedLoopJoin / CartesianProduct") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val df = CosineJoin.pairsExact(vecs, "vec_id", "embedding", Dim, 0.25, 8)
    val p = df.queryExecution.executedPlan
    assert(p.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, "BNLJ in plan")
    assert(p.collect { case j: CartesianProductExec => j }.isEmpty, "cartesian in plan")
  }
}
