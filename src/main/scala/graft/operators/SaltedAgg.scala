package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation for skewed group keys. A hot key melts the
  * one reducer that owns it; salting fans each key out over `saltBuckets`
  * partial groups (phase 1: shuffle on (key, salt) — uniform), then merges
  * the ≤ saltBuckets partials per key (phase 2: tiny shuffle on key).
  *
  * Only aggregates with a merge function compose this way — the caller
  * supplies (phase1, phase2) pairs, e.g. (count → sum), (sum → sum),
  * (min → min), (max → max). For algebraic pairs the result is EXACTLY the
  * direct single-shuffle aggregation (pinned by the oracle query).
  *
  * Spark's own AQE skew handling covers joins; aggregation skew at 100 TB
  * (e.g. grouping web text by domain) still needs this pattern.
  */
object SaltedAgg {

  /** @param salt deterministic salt column (e.g. `pmod(hash(id), n)` or a
    *             stable row attribute) — must be uniform within hot keys. */
  def aggregate(df: DataFrame, keys: Seq[String], salt: Column, saltBuckets: Int,
      phase1: Seq[(String, Column)], phase2: Seq[(String, Column => Column)]): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(salt, lit(saltBuckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1.head._2.as(s"__p_${phase1.head._1}"),
        phase1.tail.map { case (n, c) => c.as(s"__p_$n") }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(phase2.head._2(col(s"__p_${phase2.head._1}")).as(phase2.head._1),
        phase2.tail.map { case (n, f) => f(col(s"__p_$n")).as(n) }: _*)
  }
}
