package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming KMV distinct-count maintenance: the per-key state is the k
  * SMALLEST distinct md5 hashes seen so far — bounded at k longs per key
  * however long the stream runs — and each micro-batch emits the key's
  * refreshed cardinality estimate (k−1)/(h_k/2³²).
  *
  * Correctness rides on KMV being a MONOID (the k smallest of a union is
  * the k smallest of the merged sketches — the same property
  * `agg_kmv_merge_daily` pins cross-engine in batch), so the streamed
  * left-fold over arbitrary micro-batch boundaries equals the one-shot
  * batch sketch of the full input: pinned in StreamingSketchSpec against
  * [[graft.operators.Stats.kmvDistinct]]. The streaming face of the
  * reference's `__len__` cardinality operator
  * (vectordb/kd_tree_database.py:307-308) at key-level, sketch scale.
  */
object StreamSketch {

  /** (key, n_in_sketch, kth_h, est_distinct) per key per micro-batch.
    * `est_distinct` is exact while the sketch is unsaturated
    * (n_in_sketch < k ⇒ estimate = true distinct count seen). */
  def kmvDistinctStreaming(rows: DataFrame, key: String, value: String,
      k: Int): DataFrame = {
    require(k >= 2, "kmvDistinctStreaming: need k >= 2")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(key).cast("string").as("k"),
        graft.operators.Dedup.md5Int32(col(value).cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[(String, Long)],
         state: GroupState[Array[Long]]) =>
          val prev = state.getOption.getOrElse(Array.empty[Long])
          // merge = k smallest of (state ∪ batch hashes), distinct
          val merged = (prev ++ batch.map(_._2)).distinct.sorted.take(k)
          state.update(merged)
          val n = merged.length
          val kth = merged.last
          val est =
            if (n < k) n.toDouble // unsaturated: the sketch IS the set
            else BigDecimal((n - 1).toDouble / (kth.toDouble / 4294967296.0))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          Iterator((key, n.toLong, kth, est))
      }
      .toDF("key", "n_in_sketch", "kth_h", "est_distinct")
  }

  /** Streaming per-key TOP-K maintenance: the state is the k best
    * (score DESC, id ASC) rows seen so far for the key — the leaderboard /
    * best-candidates server. Like the KMV sketch (and unlike averages or
    * heavy-hitter counters), bounded top-k is a MONOID: top-k of a union
    * is the top-k of the merged tails, so the streamed fold is EXACTLY the
    * batch per-id-best top-k of the full input under any batching. The
    * state dedups BY ID keeping each id's best score, so one id can never
    * occupy two slots: byte-identical re-delivery is absorbed, and
    * re-delivery with an updated score keeps the id's maximum. State: k
    * (score, id) pairs per key, forever-bounded. Each micro-batch
    * re-emits the key's refreshed list with dense ranks. */
  def topKStreaming(rows: DataFrame, key: String, id: String, score: String,
      k: Int): DataFrame = {
    require(k >= 1, "topKStreaming: need k >= 1")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(key).cast("string").as("k"),
        col(id).cast("long").as("i"), col(score).cast("double").as("s"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[(String, Long, Double)],
         state: GroupState[Array[(Double, Long)]]) =>
          val prev = state.getOption.getOrElse(Array.empty[(Double, Long)])
          val merged = (prev ++ batch.map(r => (r._3, r._2)))
            .groupBy(_._2) // dedup BY ID: an updated score replaces, never duplicates
            .iterator.map { case (i, vs) => (vs.iterator.map(_._1).max, i) }
            .toArray
            .sortBy { case (s, i) => (-s, i) }
            .take(k)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case ((s, i), r) =>
            (key, i, s, r + 1)
          }
      }
      .toDF("key", "id", "score", "rank")
  }
}
