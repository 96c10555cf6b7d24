package graft

import graft.index.GridConfig
import graft.operators.{DensityCluster, TextAnalysis}

class DensityClusterSpec extends SparkSpecBase {
  import spark.implicits._

  private val cfg =
    GridConfig(dim = 2, lower = 0.0, upper = 8.0, partsPerDim = 8, gridDims = 2)

  private def pts(cells: (Int, Int, Int)*): org.apache.spark.sql.DataFrame =
    cells.flatMap { case (bx, by, n) =>
      Seq.fill(n)(Array(bx + 0.5, by + 0.5))
    }.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")

  test("two separated blobs cluster apart; sparse cells are not core") {
    // blob A: cells (0,0),(0,1),(1,0); blob B: (5,5),(6,6) diagonal-adjacent;
    // noise: (3,3) below minPts
    val df = pts((0, 0, 4), (0, 1, 5), (1, 0, 3), (5, 5, 4), (6, 6, 4), (3, 3, 2))
    val got = DensityCluster.gridClusters(df, "v", cfg, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    // cell ids: bx*8+by
    assert(got.keySet == Set(0L, 1L, 8L, 45L, 54L), s"core cells: $got")
    assert(Set(got(0L), got(1L), got(8L)).size == 1, "blob A is one cluster")
    assert(got(45L) == got(54L), "diagonal adjacency merges blob B")
    assert(got(0L) != got(45L), "blobs stay separate")
  }

  test("isolated core cell is its own singleton cluster") {
    val df = pts((2, 2, 5), (7, 7, 5))
    val sum = DensityCluster.gridClusterSummary(df, "v", cfg, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(sum.toSeq == Seq((2L * 8 + 2, 1L, 5L), (7L * 8 + 7, 1L, 5L)))
  }

  test("summary counts points per cluster, not per cell") {
    val df = pts((0, 0, 4), (0, 1, 6))
    val sum = DensityCluster.gridClusterSummary(df, "v", cfg, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sum.toSeq == Seq((0L, 2L, 10L)))
  }

  test("assign labels every point; sub-minPts cells are noise (-1)") {
    val df = pts((0, 0, 4), (0, 1, 5), (3, 3, 2), (6, 6, 4))
    val got = DensityCluster.assign(df, "id", "v", cfg, minPts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 15, "every point gets a row")
    val byCell = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1))).toMap
    val noise = byCell.collect { case (id, v) if v(0).toInt == 3 => id }
    noise.foreach(id => assert(got(id) == -1L, s"point $id must be noise"))
    // blob A spans cells (0,0)+(0,1) -> one label (min cell id 0)
    byCell.collect { case (id, v) if v(0) < 1.0 => id }
      .foreach(id => assert(got(id) == 0L))
    // isolated core cell (6,6) keeps its own cell id as label
    byCell.collect { case (id, v) if v(0).toInt == 6 => id }
      .foreach(id => assert(got(id) == 6L * 8 + 6))
  }

  test("PMI ranks the collocated bigram above an independent co-occurrence") {
    // "x y" always adjacent; "p"/"q" frequent but never adjacent
    val docs = Seq(
      (1L, "x y p a q b x y c d"),
      (2L, "p e x y f q g h x y"),
      (3L, "q i j p k x y l m n")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, minCount = 2, k = 50).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(got.contains(("x", "y")))
    assert(got(("x", "y")) > 0.0)
    // hand-computed: 30 tokens, 27 bigrams, c(x,y)=5, c(x)=c(y)=5
    // pmi = ln5 - ln27 - ln5 - ln5 + 2 ln30 ≈ ln(5*900/(27*25))
    val expected = math.log(5.0) - math.log(27.0) - 2 * math.log(5.0) +
      2 * math.log(30.0)
    assert(math.abs(got(("x", "y")) - expected) < 1e-6, s"got ${got(("x", "y"))}")
    assert(!got.contains(("p", "q")), "never-adjacent pair has no bigram row")
  }

  test("letter entropy: uniform 2-letter text gives ln 2, monotone text 0") {
    val docs = Seq(
      (1L, "aabb"), (2L, "aaaa"), (3L, "AaB!b"), (4L, "123 .,;")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.letterEntropy(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(math.abs(got(1L)._2 - math.log(2.0)) < 1e-6)
    assert(got(2L) == ((4L, 0.0)))
    assert(got(3L)._1 == 4L, "case-folds and ignores non-letters")
    assert(math.abs(got(3L)._2 - math.log(2.0)) < 1e-6)
    assert(!got.contains(4L), "letter-free docs are filtered")
  }
}
