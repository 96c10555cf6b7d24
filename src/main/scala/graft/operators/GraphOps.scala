package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over similarity-pair edge lists — the structural read
  * side of the dedup machinery (connected components already drive
  * `Dedup.clusterCanonical`; these operators measure the graph itself:
  * how clustered is the near-duplicate structure?).
  *
  * Edges arrive canonicalized (`src < dst`, one row per undirected edge) —
  * exactly what the cosine/LSH/SimHash pair generators emit.
  *
  * Scale shape: triangle counting is the standard two-join edge-iterator
  * (each join shuffles on an endpoint; the `src < dst < ext` orientation
  * counts each triangle exactly once and keeps the join frontier to
  * forward wedges only). Degrees are one explode + groupBy.
  */
object GraphOps {

  /** Per-node degree over the undirected edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))

  /** One-row structural summary: nodes, edges, triangles, max degree.
    * Triangles: wedges a<b<c built from (a,b)⋈(b,c), closed by (a,c).
    * The edge list feeds five plan subtrees (three triangle legs, degrees,
    * edge count) — persist it so an expensive upstream pair generator
    * (cosine cross join, LSH banding) runs ONCE, not five times; spills to
    * disk rather than recomputing at scale. The summary is ONE row, so it
    * is computed eagerly and the cache released before returning — a lazy
    * return would leak the persisted edges for the session's lifetime. */
  def summary(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.dst") === col("e2.src"))
        .join(e.as("e3"),
          col("e1.src") === col("e3.src") && col("e2.dst") === col("e3.dst"))
        .agg(count(lit(1)).as("n_triangles"))
      val deg = degrees(e).agg(
        count(lit(1)).as("n_nodes"), max(col("degree")).as("max_degree"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      val out = ne.crossJoin(deg).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_triangles"), col("max_degree"))
      val row = out.collect()
      spark.createDataFrame(spark.sparkContext.parallelize(row.toSeq, 1), out.schema)
    } finally e.unpersist()
  }

  /** Multi-source BFS hop distances with a FIXED superstep count — the
    * "how far is everything from the seed set" read (e.g. distance from
    * known-good anchor documents through the near-duplicate graph).
    *
    * Frontier-optimal: after the per-superstep `min(hop)` fold, a node
    * carries `hop == i-1` iff superstep i-1 FIRST reached it, so the
    * filter recovers exactly the frontier and superstep i joins |frontier|
    * rows against the edge list — not |reached| — the textbook Pregel BFS
    * shape. One join + one aggregation per superstep, both shuffling on
    * node id. Hops are integers, so the unrolled SQL oracle replays the
    * loop with no quantization at all.
    *
    * Output: (node, hop) for every node within `maxHops` of a seed;
    * isolated seeds still appear at hop 0. */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      driverThreshold: Long = 100000L): DataFrame = {
    // partitioned on src before the persist — each hop joins on src, so
    // only the frontier exchanges per round (cf. pageRank)
    val dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Cost-based path choice (the Knn.bruteForceThreshold pattern): the
    // edge list materializes into the cache either way; when it is
    // driver-small, per-superstep job overhead — not data — dominates
    // the distributed loop (3×(join + agg) + final fold ≈ 8 jobs for a
    // few hundred edges), so run the textbook BFS on the collected list.
    // Same exact result: hops are integers with a min fold.
    val nDir = dir.count()
    if (nDir <= driverThreshold) {
      val spark = edges.sparkSession
      val adj = dir.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      val hops = scala.collection.mutable.Map.empty[Long, Long]
      var frontier = seeds.select(col("node")).distinct()
        .collect().map(_.getLong(0)).toSeq
      frontier.foreach(hops(_) = 0L)
      for (i <- 1 to maxHops) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Array.empty[Long]))
          .distinct.filterNot(hops.contains)
        frontier.foreach(hops(_) = i.toLong)
      }
      dir.unpersist()
      import spark.implicits._
      return hops.toSeq.toDF("node", "hop")
    }
    var dist = seeds.select(col("node")).distinct()
      .withColumn("hop", lit(0L))
    for (i <- 1 to maxHops) {
      val frontier = dist.filter(col("hop") === (i - 1).toLong)
      val next = dir.join(frontier, dir("src") === frontier("node"))
        .select(col("dst").as("node"), lit(i.toLong).as("hop"))
      dist = dist.unionByName(next)
        .groupBy(col("node")).agg(min(col("hop")).as("hop"))
      // sever lineage every two supersteps (the Dedup.connectedComponents
      // device): without it the evolving dist plan doubles per round —
      // fine at maxHops=3, a plan/recompute blow-up at 30
      if (i % 2 == 0) dist = dist.localCheckpoint(true)
    }
    // final eager checkpoint so the returned frame no longer references
    // the cached edge list — lets us release it here instead of leaking
    // the persist for the session's lifetime
    val out = dist.localCheckpoint(true)
    dir.unpersist(false)
    out
  }

  /** Semi-supervised label propagation with FIXED rounds and clamped
    * seeds: each round every node adjacent to a labeled node takes the
    * plurality label of its labeled neighbors, ties broken by the SMALLEST
    * label; seed nodes never change. Votes are integer counts, so the
    * whole loop is engine-exact with no quantization.
    *
    * The winner per node is one aggregation — `max(struct(cnt, -label))`
    * picks (highest count, then lowest label) lexicographically — instead
    * of a rank window, so each round is two hash aggregations + one join,
    * no sort. Labels must be non-negative (the negation trick). */
  def labelProp(edges: DataFrame, seedLabels: DataFrame, iters: Int,
      driverThreshold: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.types.LongType
    // partitioned on src before the persist — each round's vote join is
    // on src, so only the label table exchanges per round (cf. pageRank)
    val dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seeds = seedLabels
      .select(col("node"), col("label").cast(LongType).as("label"))
    // cost-based driver path (cf. bfsHops): per-round 2 aggregations +
    // joins are pure job overhead on a driver-small edge list; integer
    // votes with the (max count, min label) winner replay exactly
    val nDir = dir.count()
    if (nDir <= driverThreshold) {
      val spark = edges.sparkSession
      val adj = dir.collect().map(r => r.getLong(0) -> r.getLong(1))
      val seedMap = seeds.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      var labMap = seedMap
      for (_ <- 1 to iters) {
        val votes = adj.flatMap { case (src, dst) =>
          labMap.get(src).map(l => (dst, l))
        }.groupBy(_._1).map { case (dst, vs) =>
          val counts = vs.groupBy(_._2).map { case (l, g) => (l, g.size) }
          // plurality, ties to the SMALLEST label
          dst -> counts.toSeq.maxBy { case (l, c) => (c.toLong, -l) }._1
        }
        labMap = seedMap ++ votes.filterNot { case (n, _) => seedMap.contains(n) }
      }
      dir.unpersist()
      import spark.implicits._
      return labMap.toSeq.toDF("node", "label")
    }
    var lab = seeds
    var round = 0
    for (_ <- 1 to iters) {
      round += 1
      val votes = dir.join(lab, dir("src") === lab("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
      val win = votes
        .groupBy(col("dst").as("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
      lab = seeds.unionByName(
        win.join(seeds.select(col("node")), Seq("node"), "left_anti"))
      // sever lineage every two rounds (cf. bfsHops / connectedComponents)
      if (round % 2 == 0) lab = lab.localCheckpoint(true)
    }
    val out = lab.localCheckpoint(true)
    dir.unpersist(false)
    out
  }

  /** PageRank with a FIXED iteration count over the undirected edge list —
    * the centrality read on the similarity graph (which documents anchor a
    * near-dup neighborhood). Undirected expansion gives every node
    * degree >= 1, so there are no dangling nodes and mass is conserved.
    *
    * Each iteration is one join of the rank table against the edge list
    * plus one aggregation — both shuffle on node id, the plan a 100 TB
    * graph engine runs per superstep. Engine-exactness: per-edge
    * contributions are FLOOR-quantized to integer nano-units
    * (`floor(x·1e9)` as BIGINT) and summed exactly — floor of a double
    * product is the same IEEE operation in every engine, unlike ROUND,
    * whose half-boundary behavior differs between Spark's exact-decimal
    * HALF_UP and DuckDB's scaled-multiply (observed: a 1-ulp pr
    * divergence at 0.0050926215). Fixed `iters` makes the WHOLE loop
    * replayable, the same contract as [[Pca]]'s power iteration.
    *
    * Output: (node, pr) with pr floor-quantized to 9 decimals. */
  def pageRank(edges: DataFrame, iters: Int = 3,
      damping: Double = 0.85, driverThreshold: Long = 100000L): DataFrame = {
    // hash-partitioned on src BEFORE the persist: every superstep joins
    // this table on src, and the cached partitioning is recognized by the
    // planner — so per iteration only the (|nodes|-row) rank side
    // exchanges, never the edge list (the big side shuffles once, here);
    // the degree aggregation rides the same partitioning for free
    val dir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cost-based driver path (r16 — the bfsHops/labelProp pattern finally
    // applied to the third loop): on a driver-small edge list the
    // distributed loop is pure job overhead (measured 29 stages for 3
    // supersteps over a ~200-node similarity graph). The local loop
    // replays the identical arithmetic — floor(pr/deg·1e9) per-edge
    // contributions summed as exact longs, q9 fold per node — so the
    // result is bit-identical (same IEEE ops, order-free integer sum);
    // pinned against the distributed loop in GraphOpsSpec.
    val nDir = dir.count()
    if (nDir <= driverThreshold) {
      val spark = edges.sparkSession
      val adj = dir.collect().map(r => (r.getLong(0), r.getLong(1)))
      dir.unpersist(false)
      val degM = adj.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
      val n = degM.size
      require(n > 0, "pageRank: empty graph")
      val base = (1.0 - damping) / n
      def q9(x: Double): Double = math.floor(x * 1e9) / 1e9
      var pr: Map[Long, Double] = degM.map { case (k, _) => k -> q9(1.0 / n) }
      for (_ <- 1 to iters) {
        val c9 = scala.collection.mutable.Map.empty[Long, Long]
        adj.foreach { case (src, dst) =>
          val c = math.floor((pr(src) / degM(src).toDouble) * 1e9).toLong
          c9.update(dst, c9.getOrElse(dst, 0L) + c)
        }
        pr = c9.iterator.map { case (node, s) =>
          node -> q9(base + damping * (s.toDouble / 1e9))
        }.toMap
      }
      import spark.implicits._
      return pr.toSeq.toDF("node", "pr")
    }
    val deg = dir.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = deg.count()
    require(n > 0, "pageRank: empty graph")
    val base = (1.0 - damping) / n
    // engine-exact 9-decimal floor quantization: floor(x·1e9)/1e9 — both
    // engines compute the identical double product and identical floor
    def q9(c: Column): Column = floor(c * lit(1e9)) / lit(1e9)
    var pr = deg.select(col("node"), col("deg"), q9(lit(1.0 / n)).as("pr"))
    var it = 0
    for (_ <- 1 to iters) {
      it += 1
      val contrib = dir
        .join(pr, dir("src") === pr("node"))
        .select(col("dst"),
          floor((col("pr") / col("deg")) * lit(1e9)).as("c9"))
      pr = contrib.groupBy(col("dst").as("node"))
        .agg(q9(lit(base) +
          lit(damping) * (sum(col("c9")).cast("double") / lit(1e9))).as("pr"))
        .join(deg, "node")
        .select(col("node"), col("deg"), col("pr"))
      // sever lineage every two iterations (cf. bfsHops / labelProp):
      // the rank table's plan otherwise nests one join+agg layer per
      // superstep — a recompute/plan blow-up at high iteration counts
      if (it % 2 == 0) pr = pr.localCheckpoint(true)
    }
    val out = pr.select(col("node"), col("pr")).localCheckpoint(true)
    dir.unpersist(false); deg.unpersist(false)
    out
  }
}
