package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key admission cap: admit at most `n` rows per key across
  * the WHOLE stream, first-arrived-first-admitted — the online form of
  * [[graft.operators.Governance.capPerKey]] (per-source quota enforced at
  * ingest time instead of in a later batch pass). The state per key is a
  * single admitted-count Int, so state size is |keys|, not |rows| —
  * bounded however long the stream runs; the per-invocation sort sees
  * only one key's slice of one micro-batch.
  *
  * Equivalence contract (pinned in StreamingCapSpec): when rows arrive in
  * event-time order, the admitted set is EXACTLY the batch
  * `capPerKey(ordering = (ts, id))` of the full input. Under
  * out-of-order arrival the streaming form admits by arrival, which is
  * the deliberate online-quota semantic (a batch repair pass reconciles
  * if event-time order must be exact).
  */
object StreamCap {

  /** (key, ts, id) rows admitted under the per-key cap. */
  def capPerKeyStreaming(events: DataFrame, key: String, ts: String,
      id: String, n: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(key).cast("string").as("k"),
        col(ts).cast("long").as("t"), col(id).cast("long").as("i"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[Int]) =>
          val admitted = state.getOption.getOrElse(0)
          // deterministic within the micro-batch: admit in (ts, id) order
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          val out = sorted.take(math.max(0, n - admitted))
          if (out.nonEmpty) state.update(admitted + out.size)
          out.iterator
      }
      .toDF("k", "t", "i")
  }
}
