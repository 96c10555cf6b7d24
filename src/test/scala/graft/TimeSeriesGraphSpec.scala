package graft

import graft.operators.{GraphOps, TimeSeries}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeSeriesGraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("time-weighted average weighs samples by holding interval") {
    // key 1: value 10 held 30s, value 20 held 10s, trailing sample unweighted
    val ev = Seq(
      (1L, 1L, t("2024-01-01 00:00:00"), 10.0),
      (2L, 1L, t("2024-01-01 00:00:30"), 20.0),
      (3L, 1L, t("2024-01-01 00:00:40"), 99.0), // last — carries no weight
      (4L, 2L, t("2024-01-01 00:00:00"), 5.0),
      (5L, 2L, t("2024-01-01 00:01:00"), 7.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = TimeSeries.timeWeightedAvg(ev, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    // user 1: (10*30s + 20*10s) / 40s = 12.5 over 40s, 2 intervals
    assert(got(1L) == ((10.0 * 30 + 20.0 * 10) / 40.0, 40L, 2L))
    // user 2: single interval → twa = first value
    assert(got(2L) == (5.0, 60L, 1L))
  }

  test("time-weighted average is deterministic under duplicate timestamps") {
    val ev = Seq(
      (2L, 1L, t("2024-01-01 00:00:00"), 4.0), // same ts — event_id orders
      (1L, 1L, t("2024-01-01 00:00:00"), 2.0),
      (3L, 1L, t("2024-01-01 00:00:10"), 8.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val r = TimeSeries.timeWeightedAvg(ev, "user_id", "ts", "value", "event_id")
      .collect().head
    // order: (2.0, dt 0s), (4.0, dt 10s) → twa = 4.0 over 10s
    assert(r.getDouble(1) == 4.0 && r.getLong(2) == 10L && r.getLong(3) == 2L)
  }

  test("graph summary counts each triangle exactly once") {
    // 1-2-3 triangle, 2-3-4 triangle sharing edge (2,3), pendant 4-5
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val r = GraphOps.summary(edges).collect().head
    assert(r.getLong(0) == 5)  // nodes
    assert(r.getLong(1) == 6)  // edges
    assert(r.getLong(2) == 2)  // triangles {1,2,3} and {2,3,4}
    assert(r.getLong(3) == 3)  // max degree: nodes 2, 3, 4 each touch 3 edges
  }

  test("triangle-free graph reports zero") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = GraphOps.summary(edges).collect().head
    assert(r.getLong(2) == 0)
  }

  test("OHLC bars: open/close follow the total (ts, tie) order under duplicate timestamps") {
    val t0 = 1700000000L
    def ts(s: Long) = new Timestamp(s * 1000)
    val ev = Seq(
      // one hourly bucket, duplicate timestamps: order by (ts, event_id)
      ("a", ts(t0), 1L, 5.0), ("a", ts(t0), 0L, 3.0),   // open = 3.0 (id 0 first)
      ("a", ts(t0 + 10), 2L, 9.0), ("a", ts(t0 + 20), 4L, 2.0),
      ("a", ts(t0 + 20), 3L, 7.0),                       // close = 2.0 (id 4 last)
      // second bucket, single row
      ("a", ts(t0 + 3600), 5L, 4.5)
    ).toDF("k", "ts", "event_id", "value")
    val bars = TimeSeries.ohlc(ev, "k",
        unix_timestamp(date_trunc("hour", col("ts"))), "ts", "value", "event_id")
      .orderBy(col("bucket"))
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(bars(0) === ((3.0, 9.0, 2.0, 2.0, 5L)))
    assert(bars(1) === ((4.5, 4.5, 4.5, 4.5, 1L)))
  }

  test("OHLC bars: sub-second timestamp order beats the tie column") {
    val t0 = 1700000000L
    // same second, different milliseconds; tie ids DESCEND chronologically
    def tsm(ms: Long) = new Timestamp(t0 * 1000 + ms)
    val ev = Seq(
      ("a", tsm(900), 1L, 5.0),  // chronologically LAST despite smaller id
      ("a", tsm(100), 2L, 3.0)   // chronologically FIRST
    ).toDF("k", "ts", "event_id", "value")
    val bar = TimeSeries.ohlc(ev, "k",
        unix_timestamp(date_trunc("hour", col("ts"))), "ts", "value", "event_id")
      .collect()(0)
    assert(bar.getDouble(2) === 3.0, "open must be the 100ms event")
    assert(bar.getDouble(5) === 5.0, "close must be the 900ms event")
  }

  test("pageRank equals a driver-side replay with the same quantization") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // plain-Scala replay of the exact arithmetic: floor-quantized
    // nano-unit contributions, exact long sum, same base/damping doubles
    def q9(x: Double): Double = math.floor(x * 1e9) / 1e9
    val dir = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = dir.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size
    val base = (1.0 - 0.85) / n
    var pr = deg.keys.map(_ -> q9(1.0 / n)).toMap
    for (_ <- 1 to 3) {
      val sums = dir.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => math.floor((pr(src) / deg(src)) * 1e9).toLong }.sum
      }
      pr = sums.map { case (node, s9) => node -> q9(base + 0.85 * (s9.toDouble / 1e9)) }
    }
    assert(got === pr)
    // mass conservation and symmetry (1 and 4 are NOT symmetric here; 1 is
    // a pendant of 2, 4 closes the 2-3-4 triangle — just check the sum)
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("pageRank on a symmetric path: end nodes equal, middle nodes equal") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = GraphOps.pageRank(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) === got(4L))
    assert(got(2L) === got(3L))
    assert(got(2L) > got(1L))
  }
}
