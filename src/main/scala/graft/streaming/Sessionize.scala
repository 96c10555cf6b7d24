package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType
import scala.math.BigDecimal.RoundingMode

/** Gap-based sessionization of event streams — the custom-state streaming
  * operator (SURVEY.md §2.2 streaming row; the reference has no streaming
  * at all). Two equivalent forms:
  *
  *  - [[batch]]: lag + running-sum session ids over a window — one shuffle
  *    on user_id, oracle-expressible in ANSI SQL.
  *  - [[streaming]]: `flatMapGroupsWithState` with event-time timeout —
  *    per-user open-session state, closed sessions emitted either when a
  *    later event proves the gap or when the watermark passes
  *    session_end + gap. State is O(open session) per user.
  *
  * Time is floored to epoch SECONDS in both forms (and in the DuckDB
  * oracle) so gap comparisons are engine-exact despite ns-precision input.
  * Sums are accumulated in scale-3 decimal, matching the batch dsum.
  *
  * Late-data caveat: `flatMapGroupsWithState` does NOT auto-drop rows older
  * than the watermark — an event arriving after its session already closed
  * on timeout starts a NEW session rather than merging, so the streaming
  * form can split what the batch form merges. Set `watermarkDelay` to the
  * source's real out-of-orderness bound; within that bound the two forms
  * agree (pinned by SessionizeSpec).
  */
object Sessionize {

  /** user_id, event time (ns-precision timestamp), event id, value. */
  case class StreamEv(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  case class SessionOut(user_id: Long, session_idx: Long, session_start: Long,
      session_end: Long, n_events: Long, v_sum: Double)
  /** Open-session buffer (tse, event_id, value) + closed-session counter. */
  case class SessState(buf: List[(Long, Long, Double)], nextIdx: Long)

  def batch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapSec = gapMinutes * 60L
    val tse = col("ts").cast("long")
    val order = Window.partitionBy(col("user_id")).orderBy(col("tse").asc, col("event_id").asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("value"), tse.as("tse"))
      .withColumn("prev", lag(col("tse"), 1).over(order))
      .withColumn("new_sess",
        when(col("prev").isNotNull && col("tse") - col("prev") > gapSec, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_sess")).over(running))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("tse")).as("session_start"),
        max(col("tse")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 3))).cast("double").as("v_sum"))
  }

  def streaming(events: Dataset[StreamEv], gapMinutes: Int = 30,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapSec = gapMinutes * 60L

    def vsum(buf: List[(Long, Long, Double)]): Double =
      buf.map(e => BigDecimal(e._3).setScale(3, RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _).toDouble

    def close(user: Long, idx: Long, buf: List[(Long, Long, Double)]): SessionOut =
      SessionOut(user, idx, buf.head._1, buf.last._1, buf.length, vsum(buf))

    def fn(user: Long, it: Iterator[StreamEv], state: GroupState[SessState]): Iterator[SessionOut] = {
      val st = state.getOption.getOrElse(SessState(Nil, 0L))
      if (state.hasTimedOut) {
        // watermark passed session_end + gap: the open session is final.
        val out = if (st.buf.nonEmpty) Iterator.single(close(user, st.nextIdx, st.buf)) else Iterator.empty
        state.update(SessState(Nil, st.nextIdx + (if (st.buf.nonEmpty) 1 else 0)))
        out
      } else {
        val incoming = it.map(e => (e.ts.getTime / 1000L, e.event_id, e.value)).toList
        val all = (st.buf ++ incoming).sortBy(e => (e._1, e._2))
        // split into gap-separated runs; all but the last are closed.
        val runs = all.foldLeft(List.empty[List[(Long, Long, Double)]]) { (acc, e) =>
          acc match {
            case cur :: rest if e._1 - cur.last._1 <= gapSec => (cur :+ e) :: rest
            case _ => List(e) :: acc
          }
        }.reverse
        val closed = runs.dropRight(1)
        val open = runs.lastOption.getOrElse(Nil)
        val out = closed.zipWithIndex.map { case (b, i) => close(user, st.nextIdx + i, b) }
        state.update(SessState(open, st.nextIdx + closed.length))
        if (open.nonEmpty) {
          // Clamp above the current watermark: setTimeoutTimestamp THROWS on
          // a timestamp ≤ watermark, so a batch whose open session already
          // ended more than gap+delay ago (late-ish data) would otherwise
          // kill the query instead of timing out on the next trigger.
          val proposed = (open.last._1 + gapSec) * 1000L + 1000L
          state.setTimeoutTimestamp(math.max(proposed, state.getCurrentWatermarkMs() + 1000L))
        }
        out.iterator
      }
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
