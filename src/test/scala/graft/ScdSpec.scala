package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ScdSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("scd2 collapses consecutive repeats into validity intervals") {
    val log = Seq(
      (1L, 1L, "A", t("2024-01-01 00:00:00")),
      (2L, 1L, "A", t("2024-01-02 00:00:00")), // repeat — collapsed
      (3L, 1L, "B", t("2024-01-03 00:00:00")),
      (4L, 1L, "A", t("2024-01-04 00:00:00")), // A again — NEW interval
      (5L, 2L, "X", t("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Snapshot.scd2(log, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getInt(4)))
    assert(got.toSeq == Seq(
      (1L, "A", t("2024-01-01 00:00:00"), Some(t("2024-01-03 00:00:00")), 0),
      (1L, "B", t("2024-01-03 00:00:00"), Some(t("2024-01-04 00:00:00")), 0),
      (1L, "A", t("2024-01-04 00:00:00"), None, 1),
      (2L, "X", t("2024-01-01 00:00:00"), None, 1)))
  }

  test("scd2 is deterministic under duplicate timestamps (tie column)") {
    val log = Seq(
      (2L, 1L, "B", t("2024-01-01 00:00:00")), // same ts — event_id orders
      (1L, 1L, "A", t("2024-01-01 00:00:00")),
      (3L, 1L, "C", t("2024-01-02 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Snapshot.scd2(log, "user_id", "event_type", "ts", "event_id")
      .orderBy("valid_from", "event_type").collect()
      .map(r => (r.getString(1), Option(r.getTimestamp(3)).isEmpty))
    // A (event 1) precedes B (event 2) at the tied ts; C is current
    assert(got.toSeq == Seq(
      ("A", false), ("B", false), ("C", true)))
  }

  test("scd2 collapses consecutive NULL attribute values") {
    val log = Seq(
      (1L, 1L, Option("A"), t("2024-01-01 00:00:00")),
      (2L, 1L, None: Option[String], t("2024-01-02 00:00:00")),
      (3L, 1L, None: Option[String], t("2024-01-03 00:00:00")), // repeat NULL — collapsed
      (4L, 1L, Option("B"), t("2024-01-04 00:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Snapshot.scd2(log, "user_id", "event_type", "ts", "event_id")
      .orderBy("valid_from").collect()
      .map(r => (Option(r.getString(1)), r.getTimestamp(2), r.getInt(4)))
    assert(got.toSeq == Seq(
      (Some("A"), t("2024-01-01 00:00:00"), 0),
      (None, t("2024-01-02 00:00:00"), 0),
      (Some("B"), t("2024-01-04 00:00:00"), 1)))
  }

  test("scd2 invariants on the events fixture") {
    val events = graft.core.Tables.events(spark, sfDir)
      .filter(col("user_id") % 20 === 0)
    val scd = Snapshot.scd2(events, "user_id", "event_type", "ts", "event_id").cache()
    // exactly one open (current) interval per user
    val perUser = scd.groupBy("user_id")
      .agg(sum(col("is_current")).as("n_open"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("n_null_to"))
      .collect()
    assert(perUser.nonEmpty)
    assert(perUser.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L))
    // intervals chain: every non-current valid_to equals the next valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from", "event_type")
    val chained = scd
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull)
      .filter(!(col("valid_to") === col("next_from")))
      .count()
    assert(chained == 0)
    // no adjacent intervals share the attribute (repeats were collapsed)
    val sameAdj = scd
      .withColumn("next_attr", lead(col("event_type"), 1).over(w))
      .filter(col("event_type") === col("next_attr"))
      // a genuine A→B→A run may repeat non-adjacently; adjacent equals are bugs
      .count()
    assert(sameAdj == 0)
    scd.unpersist()
  }
}
