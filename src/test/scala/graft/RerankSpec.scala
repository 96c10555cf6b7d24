package graft

import graft.core.Fixtures.{Dim, Q64}
import graft.functions.Distances
import graft.operators.Rerank
import org.apache.spark.sql.functions._

class RerankSpec extends SparkSpecBase {
  import spark.implicits._

  test("rrf fuses two pages with exact integer contributions") {
    // page A: ids 1,2,3 ranked 1,2,3; page B: ids 3,4 ranked 1,2
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val got = Rerank.rrf(a, b, "doc_id", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val S = 1000000000000L
    assert(got(1L) == S / 61)            // only A rank 1
    assert(got(2L) == S / 62)
    assert(got(3L) == S / 63 + S / 61)   // both lists
    assert(got(4L) == S / 62)            // only B rank 2
    // id 3 wins: present in both lists
    val top = Rerank.rrf(a, b, "doc_id", k = 1).collect().head.getLong(0)
    assert(top == 3L)
  }

  test("rrf ties break on smaller id") {
    val a = Seq((7L, 1), (5L, 2)).toDF("doc_id", "rank")
    val b = Seq((5L, 1), (7L, 2)).toDF("doc_id", "rank")
    // both score S/61 + S/62 — smaller id first
    val ids = Rerank.rrf(a, b, "doc_id", k = 2).collect().map(_.getLong(0))
    assert(ids.sameElements(Array(5L, 7L)))
  }

  test("rankPage is dense 1-based (score desc, id asc)") {
    val page = Seq((10L, 0.5), (11L, 0.9), (12L, 0.5)).toDF("doc_id", "s")
    val ranks = Rerank.rankPage(page, "doc_id", "s").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ranks == Map(11L -> 1, 10L -> 2, 12L -> 3))
  }

  test("ndcgAtK: perfect ranking scores 1, reversed ranking less") {
    val rel = Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 0L)).toDF("doc_id", "grade")
    val perfect = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val p = Rerank.ndcgAtK(perfect, rel, "doc_id", k = 3).collect().head
    assert(p.getDouble(3) == 1.0)
    val reversed = Seq((3L, 1), (2L, 2), (1L, 3)).toDF("doc_id", "rank")
    val r = Rerank.ndcgAtK(reversed, rel, "doc_id", k = 3).collect().head
    val disc = (i: Int) => 1.0 / (math.log(i + 1.0) / math.log(2.0))
    val idcg = 3.0 * disc(1) + 2.0 * disc(2) + 1.0 * disc(3)
    val dcg = 1.0 * disc(1) + 2.0 * disc(2) + 3.0 * disc(3)
    assert(math.abs(r.getDouble(1) - dcg) < 1e-6)
    assert(math.abs(r.getDouble(3) - dcg / idcg) < 1e-6)
  }

  test("ndcgAtK: ids missing from the relevance table count as grade 0") {
    val rel = Seq((1L, 2L)).toDF("doc_id", "grade")
    val run = Seq((99L, 1), (1L, 2)).toDF("doc_id", "rank")
    val r = Rerank.ndcgAtK(run, rel, "doc_id", k = 2).collect().head
    val disc2 = 1.0 / (math.log(3.0) / math.log(2.0))
    assert(math.abs(r.getDouble(1) - 2.0 * disc2) < 1e-6) // only rank-2 hit
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-6)         // ideal: grade 2 at rank 1
  }

  test("mmr matches an independent greedy reference on the fixture") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nCand = 20; val k = 5; val lambda = 0.7
    val got = Rerank.mmr(emb, Q64, Dim, nCand, k, lambda).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))

    // independent reference: same candidate page + pair sims via the SAME
    // (hash-proven) column expressions, but a structurally different
    // selection — sort-based argmax instead of the operator's scan loop
    val cand = emb.select(col("vec_id"),
        round(Distances.cosineSimLit(col("embedding"), Q64), 9).as("simq"),
        col("embedding"))
      .orderBy(col("simq").desc, col("vec_id").asc).limit(nCand).cache()
    val page = cand.select("vec_id", "simq").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pairs = cand.select(col("vec_id").as("i"), col("embedding").as("ea"))
      .crossJoin(cand.select(col("vec_id").as("j"), col("embedding").as("eb")))
      .filter(col("i") =!= col("j"))
      .select(col("i"), col("j"),
        round(Distances.cosineSimCols(col("ea"), col("eb"), Dim), 9).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    cand.unpersist()

    var selected = Vector.empty[Long]
    val expect = (1 to k).map { rank =>
      val scored = (page.keySet -- selected).toSeq.map { id =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => pairs((id, s))).max
        (id, lambda * page(id) - (1.0 - lambda) * maxSim)
      }
      val (bestId, bestScore) = scored.minBy { case (id, sc) => (-sc, id) }
      selected :+= bestId
      (rank, bestId, bestScore)
    }
    assert(got.toSeq == expect)
    // diversification sanity: the greedy page differs from plain top-k on
    // at least the ORDER (mmr re-ranks) — ids must all come from the page
    assert(got.forall { case (_, id, _) => page.contains(id) })
  }
}
