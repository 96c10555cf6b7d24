package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 100L, ts("2024-01-01 10:00:00")), // after r1
    (2L, 100L, ts("2024-01-01 12:00:00")), // exactly at r2 -> r2 visible
    (3L, 100L, ts("2024-01-01 09:00:00")), // before any right row -> null
    (4L, 200L, ts("2024-01-02 00:00:00")), // other key
    (5L, 300L, ts("2024-01-01 10:00:00"))  // key with no right rows -> null
  ).toDF("eid", "k", "t")

  private lazy val right = Seq(
    (10L, 100L, ts("2024-01-01 09:30:00"), 1.0),
    (11L, 100L, ts("2024-01-01 12:00:00"), 2.0),
    (12L, 100L, ts("2024-01-01 12:00:00"), 3.0), // same time as 11: max tiebreak (12) wins
    (20L, 200L, ts("2024-01-01 23:00:00"), 4.0)
  ).toDF("rid", "rk", "rt", "payload")

  private lazy val result = AsOfJoin.asOf(left, right,
      keyL = "k", keyR = "rk", timeL = "t", timeR = "rt",
      payloadR = Seq("rid", "payload"), tiebreakR = "rid")
    .select("eid", "rid", "payload").collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

  test("asof picks the latest right row at or before left time") {
    assert(result(1L) == 10L)
    assert(result(4L) == 20L)
  }

  test("right row at exactly the left time is visible; max tiebreak wins ties") {
    assert(result(2L) == 12L)
  }

  test("no preceding right row (or unseen key) attaches null") {
    assert(result(3L) == -1L)
    assert(result(5L) == -1L)
  }

  test("attached payload fields come from the same right row (struct atomicity)") {
    val full = AsOfJoin.asOf(left, right, "k", "rk", "t", "rt",
      Seq("rid", "payload"), "rid")
    val row = full.filter(col("eid") === 2L).select("rid", "payload").head()
    assert(row.getLong(0) == 12L && row.getDouble(1) == 3.0)
  }

  private lazy val forward = AsOfJoin.asOf(left, right,
      keyL = "k", keyR = "rk", timeL = "t", timeR = "rt",
      payloadR = Seq("rid", "payload"), tiebreakR = "rid",
      direction = "forward")
    .select("eid", "rid").collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

  test("forward asof picks the earliest right row at or after left time") {
    assert(forward(1L) == 11L) // 10:00 -> next right at 12:00, min tiebreak wins
    assert(forward(3L) == 10L) // 09:00 -> 09:30
  }

  test("forward: right row at exactly the left time is visible; min tiebreak wins ties") {
    assert(forward(2L) == 11L)
  }

  test("forward: no following right row (or unseen key) attaches null") {
    assert(forward(4L) == -1L) // 2024-01-02 is after the last key-200 right row
    assert(forward(5L) == -1L)
  }

  test("null event times: left gets null payload, null-time right rows never match (both directions)") {
    // Spark windows sort NULLS FIRST, which un-guarded would let a
    // null-time left row see the whole partition (forward) and a null-time
    // right row attach to every left (backward).
    val lNull = left.unionByName(Seq((6L, 100L, null.asInstanceOf[Timestamp])).toDF("eid", "k", "t"))
    val rNull = right.unionByName(Seq((30L, 100L, null.asInstanceOf[Timestamp], 9.0)).toDF("rid", "rk", "rt", "payload"))
    for (dir <- Seq("backward", "forward")) {
      val out = AsOfJoin.asOf(lNull, rNull, "k", "rk", "t", "rt",
          Seq("rid", "payload"), "rid", direction = dir)
        .select("eid", "rid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(out.size == 6, s"$dir: every left row must appear exactly once")
      assert(out(6L) == -1L, s"$dir: null-time left must attach null")
      assert(!out.values.exists(_ == 30L), s"$dir: null-time right must never match")
    }
  }

  private lazy val nearest = AsOfJoin.asOfNearest(left, right,
      keyL = "k", keyR = "rk", timeL = "t", timeR = "rt",
      payloadR = Seq("rid", "payload"), tiebreakR = "rid")
    .select("eid", "rid", "asof_dt_s").collect().map(r =>
      (r.getLong(0),
        (if (r.isNullAt(1)) -1L else r.getLong(1),
         if (r.isNullAt(2)) Long.MinValue else r.getLong(2)))).toMap

  test("nearest picks the closer side with a signed dt") {
    // eid=1 at 10:00: backward 09:30 (30 min) vs forward 12:00 (120 min)
    assert(nearest(1L) == (10L, -1800L))
    // eid=3 at 09:00: no backward, forward 09:30
    assert(nearest(3L) == (10L, 1800L))
    // eid=4 at 01-02 00:00: only backward (23:00 prior day)
    assert(nearest(4L) == (20L, -3600L))
  }

  test("nearest: exact-time right row matches at dt=0; |dt| tie resolves backward") {
    assert(nearest(2L) == (12L, 0L)) // backward's max-tiebreak pick wins the tie
    val sym = AsOfJoin.asOfNearest(
      Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("eid", "k", "t"),
      Seq((10L, 1L, ts("2024-01-01 09:00:00"), 1.0),
          (11L, 1L, ts("2024-01-01 11:00:00"), 2.0)).toDF("rid", "rk", "rt", "payload"),
      "k", "rk", "t", "rt", Seq("rid"), "rid")
      .select("rid", "asof_dt_s").head()
    assert(sym.getLong(0) == 10L && sym.getLong(1) == -3600L)
  }

  test("nearest: key with no right rows attaches null payload and null dt") {
    assert(nearest(5L) == (-1L, Long.MinValue))
  }

  test("nearest plans ONE exchange: both direction frames reuse the key partitioning") {
    // string-count: the Exchange sits under AdaptiveSparkPlanExec, which
    // TreeNode.collect does not descend into
    val plan = AsOfJoin.asOfNearest(left, right, "k", "rk", "t", "rt",
      Seq("rid"), "rid").queryExecution.executedPlan.toString
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nEx == 1, s"expected a single shuffle, got $nEx:\n$plan")
  }
}
