package graft

import graft.operators.Coreset
import org.apache.spark.sql.functions._

/** Greedy k-center (farthest-first) coreset selection: the distributed
  * operator must match an in-memory reference implementation of the same
  * greedy rule exactly — seed = min id, next = argmax of min squared-L2
  * distance to selected (ties → min id), early stop when the max
  * min-distance hits 0. No reference-file analog (the reference has no
  * subset-selection surface).
  */
class CoresetSpec extends SparkSpecBase {
  import spark.implicits._

  /** In-memory replay of the greedy rule (plain doubles — exact same
    * arithmetic shape: left-assoc per-center sums, running min). */
  private def refGreedy(pts: Seq[(Long, Array[Float])], k: Int): Seq[(Int, Long, Double)] = {
    if (pts.isEmpty) return Seq.empty
    def sq(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < b.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    val seed = pts.minBy(_._1)
    var centers = Vector((0, seed._1, -1.0, seed._2.map(_.toDouble)))
    var done = false
    while (!done && centers.size < k) {
      val scored = pts.map { case (id, v) =>
        (id, v, centers.map(c => sq(v, c._4)).min)
      }
      val (id, v, d) = scored.minBy { case (id, _, d) => (-d, id) }
      if (d <= 0.0) done = true
      else centers = centers :+ ((centers.size, id, d, v.map(_.toDouble)))
    }
    centers.map(c => (c._1, c._2, c._3))
  }

  private def df(pts: Seq[(Long, Array[Float])]) =
    pts.toDF("vec_id", "embedding")

  test("selection matches the in-memory greedy replay on seeded random corpora") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val dim = 2 + trial
      val pts = (0 until 60).map { i =>
        (i.toLong + 10, Array.fill(dim)((rnd.nextInt(200) - 100) / 8.0f))
      }
      val got = Coreset.kCenterSelect(df(pts), k = 6).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got === refGreedy(pts, 6), s"trial $trial")
    }
  }

  test("r_cov is non-increasing after the first selected distance") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 80).map(i => (i.toLong, Array.fill(3)(rnd.nextFloat() * 4f)))
    val rs = Coreset.kCenterSelect(df(pts), k = 8).collect()
    val covs = rs.drop(1).map(_.getDouble(2))
    assert(covs.zip(covs.tail).forall { case (a, b) => a >= b },
      s"r_cov must not increase: ${covs.mkString(",")}")
  }

  test("early stop: fewer distinct vectors than k returns the distinct count") {
    val v1 = Array(1.0f, 2.0f); val v2 = Array(3.0f, 5.0f)
    val pts = Seq((1L, v1), (2L, v1), (3L, v2), (4L, v2), (5L, v1))
    val rs = Coreset.kCenterSelect(df(pts), k = 4).collect()
    assert(rs.map(r => (r.getInt(0), r.getLong(1))).toSeq === Seq((0, 1L), (1, 3L)))
  }

  test("empty input yields an empty selection") {
    assert(Coreset.kCenterGreedy(df(Seq.empty), k = 3) === Seq.empty)
  }

  test("assignment summary: populations total n, every center covers itself, max_d matches replay") {
    val rnd = new scala.util.Random(13)
    val pts = (0 until 70).map(i => (i.toLong, Array.fill(4)(rnd.nextFloat() * 3f - 1.5f)))
    val k = 5
    val sum = Coreset.kCenterAssignSummary(df(pts), k).collect()
    assert(sum.map(_.getInt(0)).toSeq === (0 until k))
    assert(sum.map(_.getLong(1)).sum === pts.size)
    // replay: nearest-center by (distance, step) with strict-< first-min
    val centers = refGreedy(pts, k)
    val cvecs = centers.map { case (_, id, _) => pts.find(_._1 == id).get._2.map(_.toDouble) }
    def sq(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < b.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    val byStep = pts.groupBy { case (_, v) =>
      val ds = cvecs.map(c => sq(v, c)); ds.indexOf(ds.min)
    }
    val expMax = (0 until k).map(st => byStep(st).map { case (_, v) =>
      cvecs.map(c => sq(v, c)).min }.max)
    assert(sum.map(_.getDouble(2)).toSeq === expMax)
    assert(sum.map(_.getLong(1)).toSeq === (0 until k).map(st => byStep(st).size.toLong))
  }

  test("sampled-page greedy: deterministic, page-restricted, corpus objective within bound of exact") {
    val rnd = new scala.util.Random(97)
    val pts = (0 until 300).map(i => (i.toLong, Array.fill(4)(rnd.nextFloat() * 4f - 2f)))
    val k = 6
    val page = 80
    val sampled = Coreset.kCenterGreedySampled(df(pts), k, page)
    val sampled2 = Coreset.kCenterGreedySampled(df(pts), k, page)
    assert(sampled.map(c => (c.step, c.vecId, c.rCov)) ===
      sampled2.map(c => (c.step, c.vecId, c.rCov)), "md5-page selection must be replayable")
    assert(sampled.size == k)
    val exact = Coreset.kCenterGreedy(df(pts), k)
    // k-center objective over the FULL corpus under each center set
    def sq(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < b.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    def objective(cs: Seq[Coreset.Center]): Double =
      pts.map { case (_, v) => cs.map(c => sq(v, c.vec)).min }.max
    val objSampled = objective(sampled)
    val objExact = objective(exact)
    // exact greedy saw every point, so it cannot be worse on its own
    // objective; the sampled set's corpus radius degrades only by the
    // page's covering slack — empirically well within 3x on this fixture
    // (squared distances, so 3x squared radius ~ 1.73x radius)
    assert(objExact > 0.0)
    assert(objSampled <= 3.0 * objExact,
      s"sampled objective $objSampled vs exact $objExact")
    // page restriction: a page >= corpus is EXACTLY the exact greedy
    val full = Coreset.kCenterGreedySampled(df(pts), k, page = pts.size)
    assert(full.map(c => (c.step, c.vecId, c.rCov)) ===
      exact.map(c => (c.step, c.vecId, c.rCov)))
  }
}
