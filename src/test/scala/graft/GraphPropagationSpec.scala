package graft

import graft.operators.{GraphOps, Stats}
import org.apache.spark.sql.functions._

class GraphPropagationSpec extends SparkSpecBase {
  import spark.implicits._

  // path 1-2-3-4-5 plus isolated edge 8-9
  private def pathEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)
  ).toDF("src", "dst")

  test("driver-path bfsHops/labelProp equal the distributed loop on random graphs") {
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 8) {
      val n = 10 + rnd.nextInt(40)
      val edges = (0 until n * 2).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
      val seeds = (0 until n by 4).map(i => (i.toLong, (i % 3) + 1L)).toDF("node", "label")
      val bfsSeeds = seeds.select(col("node"))
      def rowsB(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // driverThreshold = 0 forces the distributed loop; huge forces driver
      assert(rowsB(GraphOps.bfsHops(edges, bfsSeeds, 3, driverThreshold = 0L)) ==
        rowsB(GraphOps.bfsHops(edges, bfsSeeds, 3, driverThreshold = Long.MaxValue)),
        s"bfs trial $trial")
      assert(rowsB(GraphOps.labelProp(edges, seeds, 2, driverThreshold = 0L)) ==
        rowsB(GraphOps.labelProp(edges, seeds, 2, driverThreshold = Long.MaxValue)),
        s"labelProp trial $trial")
      // r16: pageRank's driver path must be BIT-identical to the
      // distributed loop (same floor-quantized arithmetic, order-free
      // integer contribution sums)
      def rowsPr(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rowsPr(GraphOps.pageRank(edges, iters = 3, driverThreshold = 0L)) ==
        rowsPr(GraphOps.pageRank(edges, iters = 3, driverThreshold = Long.MaxValue)),
        s"pageRank trial $trial")
    }
  }

  test("bfsHops: hop counts along a path, unreached nodes absent") {
    val seeds = Seq(1L).toDF("node")
    val got = GraphOps.bfsHops(pathEdges, seeds, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsHops: multi-source takes the minimum hop; isolated seed stays at 0") {
    val seeds = Seq(1L, 5L, 42L).toDF("node") // 42 not in the graph
    val got = GraphOps.bfsHops(pathEdges, seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 3 is 2 hops from both ends; 42 is isolated
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L, 42L -> 0L))
  }

  test("bfsHops: BFS direction is undirected regardless of edge orientation") {
    val got = GraphOps.bfsHops(pathEdges, Seq(3L).toDF("node"), maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 1L, 3L -> 0L, 4L -> 1L))
  }

  test("labelProp: plurality vote with min-label tie-break, seeds clamped") {
    // triangle 1-2-3 with seeds 1→7, 3→4; node 2 hears {7, 4} → tie → min 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val seeds = Seq((1L, 7L), (3L, 4L)).toDF("node", "label")
    val got = GraphOps.labelProp(edges, seeds, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 7L, 2L -> 4L, 3L -> 4L))
  }

  test("labelProp: labels spread one hop per round and majority wins") {
    // star: center 10 adjacent to seeds 1,2 (label 5) and seed 3 (label 9);
    // leaf 11 hangs off the center and only gets a label in round 2
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (10L, 11L)).toDF("src", "dst")
    val seeds = Seq((1L, 5L), (2L, 5L), (3L, 9L)).toDF("node", "label")
    val r1 = GraphOps.labelProp(edges, seeds, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1(10L) == 5L && !r1.contains(11L))
    val r2 = GraphOps.labelProp(edges, seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2(10L) == 5L && r2(11L) == 5L)
  }

  test("deep iteration: plan size stays bounded at iters=30 and results match the driver path") {
    // 12-node cycle so 30 supersteps keep doing (idempotent) work
    val edges = (0 until 12).map(i => (i.toLong, ((i + 1) % 12).toLong)).toDF("src", "dst")
    val seeds = Seq((0L, 2L), (6L, 1L)).toDF("node", "label")
    val bfsSeeds = Seq(0L, 6L).toDF("node")
    // distributed loop forced; the every-2-rounds localCheckpoint must keep
    // the ANALYZED plan O(1) in the iteration count, not O(2^iters)
    val distBfs = GraphOps.bfsHops(edges, bfsSeeds, 30, driverThreshold = 0L)
    val distLp = GraphOps.labelProp(edges, seeds, 30, driverThreshold = 0L)
    for (df <- Seq(distBfs, distLp)) {
      val planLen = df.queryExecution.analyzed.toString.length
      assert(planLen < 20000, s"analyzed plan grew with iterations: $planLen chars")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(distBfs) ==
      rows(GraphOps.bfsHops(edges, bfsSeeds, 30, driverThreshold = Long.MaxValue)))
    assert(rows(distLp) ==
      rows(GraphOps.labelProp(edges, seeds, 30, driverThreshold = Long.MaxValue)))
    // pageRank: deep loop completes and conserves quantized mass within
    // n·1e-9 floor loss per iteration
    val pr = GraphOps.pageRank(edges, iters = 20).collect().map(_.getDouble(1))
    assert(pr.length == 12)
    assert(math.abs(pr.sum - 1.0) < 12 * 20 * 1e-9 + 1e-6)
  }

  test("welchTTest matches a hand-computed two-sample case") {
    // group a: 1,2,3,4 (mean 2.5, var 5/3); group b: 10,12 (mean 11, var 2)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 12.0)).toDF("grp", "v")
    val got = Stats.welchTTest(df, "grp", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (q1, q2) = ((5.0 / 3.0) / 4.0, 2.0 / 2.0)
    val t = (2.5 - 11.0) / math.sqrt(q1 + q2)
    val dfw = math.pow(q1 + q2, 2) / (q1 * q1 / 3.0 + q2 * q2 / 1.0)
    val (n1, m1, t1, d1) = got("a")
    assert(n1 == 4L && m1 == 2.5)
    assert(math.abs(t1 - t) < 1e-6 && math.abs(d1 - dfw) < 1e-6)
    // the b-vs-rest test is the same comparison with the sign flipped
    assert(math.abs(got("b")._3 + t1) < 1e-6)
  }
}
