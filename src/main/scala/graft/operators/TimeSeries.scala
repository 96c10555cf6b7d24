package graft.operators

import org.apache.spark.sql.DataFrame
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
}
