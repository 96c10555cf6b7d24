package graft

import graft.operators.{Stats, TimeSeries}
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class StatsTsSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("ewmaHourly decays over present buckets and renormalizes across gaps") {
    val ev = Seq(
      (1L, "a", t("2024-01-01 00:10:00"), 10.0),
      (2L, "a", t("2024-01-01 01:20:00"), 20.0),
      (3L, "a", t("2024-01-01 02:30:00"), 40.0),
      (4L, "b", t("2024-01-01 00:05:00"), 10.0),
      (5L, "b", t("2024-01-01 02:05:00"), 40.0) // hour 1 missing
    ).toDF("event_id", "event_type", "ts", "value")
    val got = TimeSeries.ewmaHourly(ev, "event_type", "ts", "value",
        alpha = 0.5, lookback = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val h0 = t("2024-01-01 00:00:00").getTime / 1000
    assert(got(("a", h0)) == 10.0)
    assert(got(("a", h0 + 3600)) == math.rint(20000000.0 / 1.5 * 0.001 * 25) / 1e6 ||
      math.abs(got(("a", h0 + 3600)) - 25.0 / 1.5) < 1e-6)
    assert(math.abs(got(("a", h0 + 7200)) - 50.0 / 1.5) < 1e-6)
    // b's hour-2 lookback window contains only itself (hour 1 is a gap)
    assert(got(("b", h0 + 7200)) == 40.0)
  }

  test("ewmaHourly averages multiple events within a bucket first") {
    val ev = Seq(
      (1L, "a", t("2024-01-01 00:10:00"), 10.0),
      (2L, "a", t("2024-01-01 00:50:00"), 30.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val got = TimeSeries.ewmaHourly(ev, "event_type", "ts", "value").collect()
    assert(got.length == 1 && got.head.getDouble(2) == 20.0)
  }

  test("equiDepthHistogram splits a uniform column into equal buckets") {
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val got = Stats.equiDepthHistogram(df, "v", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(got.values.forall(_._1 == 2L), s"equal depth: $got")
    assert(got(0L) == ((2L, 1.0, 2.0)) && got(4L) == ((2L, 9.0, 10.0)))
  }

  test("equiDepthHistogram keeps skewed mass in its own buckets") {
    // heavy tail: 16 ones + 1,10,100,1000 — fixed-width would put 19 rows
    // in the first bin; equi-depth boundaries follow the mass
    val df = (Seq.fill(16)(1.0) ++ Seq(10.0, 100.0, 1000.0, 10000.0)).toDF("v")
    val got = Stats.equiDepthHistogram(df, "v", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 20L)
    // the four big values end up in the last bucket, not with the ones
    assert(got(3L) >= 4L && got.keySet.max == 3L)
  }

  test("longestDailyStreak: islands split on gaps, duplicates within a day collapse") {
    val ev = Seq(
      // user 1: days 1,2,3 (3-streak, day 2 twice), then 5,6 (2-streak)
      (1L, t("2024-03-01 10:00:00")), (1L, t("2024-03-02 09:00:00")),
      (1L, t("2024-03-02 23:59:59")), (1L, t("2024-03-03 00:00:01")),
      (1L, t("2024-03-05 12:00:00")), (1L, t("2024-03-06 12:00:00")),
      // user 2: one day only
      (2L, t("2024-03-10 08:00:00"))
    ).toDF("uid", "ts")
    val got = TimeSeries.longestDailyStreak(ev, "uid", "ts")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (5L, 3L))
    assert(got(2L) == (1L, 1L))
  }

  test("rollingMedian matches a brute-force trailing-window median") {
    val vals = Seq(5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0, 0.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v")
    val width = 4
    val got = TimeSeries.rollingMedian(df, Seq(lit(0)), col("i"), col("v"),
        width, "med").orderBy("i").collect().map(_.getDouble(2))
    val want = vals.indices.map { i =>
      val win = vals.slice(math.max(0, i - width + 1), i + 1).sorted
      val n = win.length
      if (n % 2 == 1) win(n / 2) else (win(n / 2 - 1) + win(n / 2)) / 2.0
    }
    assert(got.toSeq == want)
  }
}
