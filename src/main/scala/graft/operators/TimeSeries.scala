package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-series operators over event streams — interval-weighted statistics
  * the plain GROUP BY average gets wrong when samples arrive unevenly (a
  * reading that held for an hour must weigh 3600× one that held a second).
  *
  * Scale shape: one window shuffle on (key, time) — the same partitioning
  * sessionization and SCD2 use, so a pipeline computing all three reuses
  * one exchange; the aggregation is map-side combinable decimal sums.
  */
object TimeSeries {

  /** Time-weighted average of `valCol` per key: each sample is weighted by
    * the WHOLE SECONDS until the NEXT sample (last sample of a key carries
    * no weight — its holding interval is unknown). Products accumulate in
    * exact decimals (value at its natural scale × integer seconds), so the
    * result is order-independent and engine-exact; the single double
    * division happens at the end. Second (not µs) resolution keeps the
    * summed numerator's unscaled value under 2^53, where decimal→double
    * conversion is correctly rounded in every engine — µs weights pushed
    * it past 2^53 and Spark/DuckDB rounded the cast differently by 1 ulp.
    * Keys whose events all share one second carry zero total weight and
    * are dropped (their average is undefined).
    *
    * Returns (key, twa, total_dt_s, n_intervals). */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String, valScale: Int = 3): DataFrame = {
    val tse = col(tsCol).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(tse, col(tieCol))
    events
      .withColumn("__dt_s", lead(tse, 1).over(w) - tse)
      .filter(col("__dt_s").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        (sum(col(valCol).cast(DecimalType(18, valScale)) * col("__dt_s")).cast("double") /
          sum(col("__dt_s")).cast("double")).as("twa"),
        sum(col("__dt_s")).as("total_dt_s"),
        count(lit(1)).as("n_intervals"))
      .filter(col("total_dt_s") > 0)
  }

  /** OHLC (open/high/low/close) downsampling: per (key, bucket) bar with
    * the first and last observed value under the total (ts, tie) order,
    * the min/max, and the sample count — the candlestick resample that
    * turns a raw event stream into fixed-period bars.
    *
    * One window for first/last positions + one aggregation, both on the
    * same (key, bucket) grouping — first/last CANNOT be plain min_by/
    * arg_min: under duplicate timestamps those tie-break arbitrarily
    * per-engine, while the row_number over (ts, tie) is total and
    * deterministic. Values aggregate exactly at their natural decimal
    * scale.
    *
    * `bucketExpr` is any derived bucket column (e.g. hour epoch).
    * Returns (key, bucket, open, high, low, close, n). */
  def ohlc(events: DataFrame, keyCol: String, bucketExpr: org.apache.spark.sql.Column,
      tsCol: String, valCol: String, tieCol: String,
      valScale: Int = 3): DataFrame = {
    val v = col(valCol).cast(DecimalType(18, valScale))
    val base = events.withColumn("__bucket", bucketExpr)
    // full microsecond order (unix_micros), NOT ts.cast(long): the cast
    // truncates to whole seconds and would let the tie column override
    // genuine sub-second order (DuckDB mirror: epoch_ns(ts) // 1000)
    val w = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(unix_micros(col(tsCol)), col(tieCol))
    base
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nb", count(lit(1)).over(
        Window.partitionBy(col(keyCol), col("__bucket"))))
      .groupBy(col(keyCol), col("__bucket").as("bucket"))
      .agg(
        max(when(col("__rn") === 1, v)).cast("double").as("open"),
        max(v).cast("double").as("high"),
        min(v).cast("double").as("low"),
        max(when(col("__rn") === col("__nb"), v)).cast("double").as("close"),
        count(lit(1)).as("n"))
  }

  /** Exponentially weighted moving average over fixed hourly buckets with
    * a bounded lookback — the smoothing read a metrics dashboard runs on
    * an uneven event stream. Each bucket's EWMA is the decay-weighted mean
    * of the last `lookback` hourly bucket means that EXIST (weights
    * renormalized over present buckets, so gaps don't drag the average
    * toward zero).
    *
    * Shape: the corpus collapses to the (key, hour) series first; the
    * EWMA is then the series joined against itself through a broadcast
    * `lookback`-row offset table — ONE equi-shuffle on (key, hour), never
    * a window over the raw events and no per-row state. Weights α^j are
    * computed once driver-side and shipped as literals, so the oracle
    * replays them exactly; per-term products are 9-decimal-quantized for
    * order-independent sums.
    *
    * Returns (key, bucket, ewma) with bucket = whole-hour epoch seconds. */
  def ewmaHourly(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, alpha: Double = 0.9, lookback: Int = 24): DataFrame = {
    require(lookback >= 1 && alpha > 0.0 && alpha <= 1.0,
      "ewmaHourly: need lookback >= 1 and alpha in (0, 1]")
    val spark = events.sparkSession
    import spark.implicits._
    val series = events
      .groupBy(col(keyCol).as("key"),
        unix_timestamp(date_trunc("hour", col(tsCol))).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(round(col(valCol), 3).cast(DecimalType(18, 3))).as("sv"))
      .select(col("key"), col("bucket"),
        round(col("sv").cast("double") / col("n").cast("double"), 6).as("x"))
    val weights = Seq.tabulate(lookback)(j => (j.toLong, math.pow(alpha, j)))
      .toDF("j", "w")
    series.as("cur").join(broadcast(weights))
      .join(series.as("prev"),
        col("prev.key") === col("cur.key") &&
          col("prev.bucket") === col("cur.bucket") - col("j") * lit(3600L))
      .groupBy(col("cur.key").as("key"), col("cur.bucket").as("bucket"))
      .agg(sum(round(col("prev.x") * col("w"), 9).cast(DecimalType(18, 9))).as("num"),
        sum(round(col("w"), 9).cast(DecimalType(18, 9))).as("den"))
      .select(col("key"), col("bucket"),
        round(col("num").cast("double") / col("den").cast("double"), 6).as("ewma"))
  }

  /** Longest run of CONSECUTIVE active days per key (gaps-and-islands):
    * distinct (key, day) pairs, then the classic day_number − row_number
    * island constant groups each unbroken run. Integer day arithmetic —
    * engine-exact. Two shuffles, both on the key (the distinct reuses the
    * window's partitioning); island collapse is map-side combinable.
    *
    * Returns (key, n_active_days, longest_streak). */
  def longestDailyStreak(events: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    // calendar-day index via datediff, NOT unix_timestamp/86400: under a
    // DST session timezone the 82800/90000-second days make the truncated
    // quotient merge or gap adjacent days; datediff counts calendar days
    // exactly in any zone (equal to the old value under UTC, so the
    // oracle's epoch arithmetic still matches there)
    val dayNum = datediff(to_date(col(tsCol)), lit("1970-01-01")).cast("long")
    val days = events.select(col(keyCol).as("key"), dayNum.as("d")).distinct()
    val w = Window.partitionBy(col("key")).orderBy(col("d").asc)
    days
      .withColumn("__island", col("d") - row_number().over(w))
      .groupBy(col("key"), col("__island"))
      .agg(count(lit(1)).as("streak"))
      .groupBy(col("key"))
      .agg(sum(col("streak")).as("n_active_days"),
        max(col("streak")).as("longest_streak"))
  }

  /** Exact sliding median of `valueCol` over the trailing `width` rows per
    * partition (ordered by `orderCol`): the window's values are gathered,
    * sorted, and the middle element (odd count) or the mean of the two
    * middles (even count — one double addition + halving, identical IEEE
    * ops in any engine) is emitted as `outCol`.
    *
    * Scale shape: collect_list over a ROWS frame holds ≤ `width` values
    * per row — memory is O(width), never O(partition); the only shuffle
    * is the window's partition-by. Suited to DOWNSAMPLED series (per-key
    * daily/hourly bars), where partitions are bounded — for raw 100 TB
    * event streams, aggregate to bars first (the OHLC/daily kernels
    * above), which is also what makes a "7-day median" well-defined. */
  def rollingMedian(df: DataFrame, partCols: Seq[Column], orderCol: Column,
      valueCol: Column, width: Int, outCol: String): DataFrame = {
    require(width >= 1, "rollingMedian: width >= 1")
    val w = Window.partitionBy(partCols: _*).orderBy(orderCol.asc)
      .rowsBetween(-(width - 1), Window.currentRow)
    val lst = sort_array(collect_list(valueCol.cast("double")).over(w))
    val n = size(lst)
    val odd = element_at(lst, floor((n + lit(1)) / lit(2)).cast("int"))
    val even = (element_at(lst, floor(n / lit(2)).cast("int")) +
      element_at(lst, (floor(n / lit(2)) + lit(1)).cast("int"))) / lit(2.0)
    df.withColumn(outCol, when(n % 2 === 1, odd).otherwise(even))
  }
}
