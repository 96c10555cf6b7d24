package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Greedy maximum-coverage document selection: pick k documents that
  * together cover as many distinct corpus tokens as possible (the
  * classic (1 − 1/e) greedy for submodular coverage) — the set-system
  * sibling of [[Coreset]]'s geometric farthest-first: where k-center
  * maximizes SPREAD in embedding space, max-coverage maximizes
  * VOCABULARY captured by a k-document exemplar set (tokenizer
  * calibration slices, eval-seed picks, coverage-curriculum heads).
  *
  * Spark shape per round (k rounds total):
  *   - uncovered (doc, token) pairs = the distinct token-pair table
  *     anti-joined against the covered-token table (one hash anti-join,
  *     AQE broadcasts `covered` while it is small);
  *   - marginal gains = one partial-aggregated count per doc;
  *   - the argmax (gain DESC, doc_id ASC) arrives via distributed top-1
  *     (`TakeOrderedAndProject`) — the driver holds the k selections and
  *     nothing else;
  *   - `covered` grows by the winner's tokens (distinct union, persisted;
  *     the previous round's table unpersisted) — it is bounded by the
  *     corpus VOCABULARY, not the corpus, and never leaves the cluster.
  * Determinism: exact counts, min-id tie-breaks — so DuckDB replays the
  * whole greedy chain as unrolled MATERIALIZED CTEs, like the k-center
  * oracle. Early-stops when the best marginal gain hits 0.
  *
  * No reference-file analog (the reference has no selection surface).
  */
object Coverage {

  final case class Pick(step: Int, docId: Long, gain: Long)

  /** `pairs` must be a DataFrame of DISTINCT (doc, token) pairs with the
    * given column names. Returns ≤ k picks in selection order. */
  def greedyMaxCoverage(pairs: DataFrame, k: Int,
      idCol: String = "doc_id", tokCol: String = "sh"): Seq[Pick] = {
    require(k >= 1, s"k=$k must be >= 1")
    val spark = pairs.sparkSession
    val base = pairs.select(col(idCol).cast("long").as("doc_id"),
        col(tokCol).cast("string").as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var covered: Option[DataFrame] = None
    try {
      var picks = Vector.empty[Pick]
      var done = false
      while (!done && picks.size < k) {
        val uncovered = covered match {
          case Some(c) => base.join(c, Seq("sh"), "left_anti")
          case None => base
        }
        val top = uncovered.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id").asc)
          .limit(1).collect()
        if (top.isEmpty || top(0).getLong(1) == 0L) done = true
        else {
          val docId = top(0).getLong(0); val gain = top(0).getLong(1)
          picks = picks :+ Pick(picks.size, docId, gain)
          val nextCovered = {
            val won = base.filter(col("doc_id") === docId).select(col("sh"))
            covered match {
              case Some(c) => c.union(won).distinct()
              case None => won.distinct()
            }
          }.persist(StorageLevel.MEMORY_AND_DISK)
          nextCovered.count() // materialize before dropping the parent
          covered.foreach(_.unpersist(false))
          // Sever lineage every few rounds: the covered table otherwise
          // accumulates one union()+distinct() layer per pick, and a lost
          // cached block at round k would replay the whole O(k)-deep chain
          // (and the analyzed plan itself grows O(k)). localCheckpoint
          // keeps recomputation depth — and plan size — O(1) per round,
          // same device as Dedup.connectedComponents.
          covered = Some(
            if (picks.size % 4 == 0) {
              val cp = nextCovered.localCheckpoint(true)
              nextCovered.unpersist(false)
              cp
            } else nextCovered)
        }
      }
      picks
    } finally {
      covered.foreach(_.unpersist(false))
      base.unpersist(false)
    }
  }

  /** Convenience: distinct word pairs from a text column, then greedy
    * selection; returns (step, doc_id, gain) as a DataFrame. */
  def selectByWordCoverage(docs: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pairs = docs
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("sh"))
      .distinct()
    greedyMaxCoverage(pairs, k)
      .map(p => (p.step, p.docId, p.gain))
      .toDF("step", "doc_id", "gain")
  }
}
