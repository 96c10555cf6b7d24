package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Stream-static enrichment: a fact stream joined to a slowly-changing
  * dimension snapshot (events × customer), then windowed aggregation per
  * dimension attribute. The static side is broadcast — each micro-batch
  * (or each map task, in batch mode) probes a local hash table and never
  * shuffles the stream; the only shuffle is the windowed groupBy, whose
  * input is already reduced map-side by partial aggregation. At 100 TB of
  * events this is the canonical "enrich then cube" shape: dimension tables
  * stay O(customers) and broadcast-able while the fact side only streams.
  */
object StreamEnrich {

  private def dsum3(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 3))).cast("double")

  /** Batch form: (c_mktsegment, hour_start, n, v_sum), hour_start as epoch
    * seconds of the hour bucket. */
  def hourlyBySegment(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_start"))
      .agg(count(lit(1)).as("n"), dsum3(col("value")).as("v_sum"))

  /** Streaming form (same result columns): tumbling 1-hour event-time
    * windows with a watermark; state for a window is dropped once the
    * watermark passes its end. Proven ≡ batch in StreamEnrichSpec. */
  def hourlyBySegmentStreaming(events: DataFrame, customer: DataFrame,
      delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), dsum3(col("value")).as("v_sum"))
      .select(col("c_mktsegment"),
        unix_timestamp(col("window.start")).as("hour_start"),
        col("n"), col("v_sum"))
}
