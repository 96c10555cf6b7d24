package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpecBase {
  import spark.implicits._

  test("diff classifies inserts, deletes, updates; drops unchanged keys") {
    val before = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40)).toDF("id", "v")
    val after = Seq((2L, 20), (3L, 99), (4L, 40), (5L, 50)).toDF("id", "v")
    val got = Snapshot.diff(before, after, "id", Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(("D", 1L), ("I", 5L), ("U", 3L)))
  }

  test("diff is null-safe on compare columns") {
    val before = Seq((1L, Some(10)), (2L, None), (3L, None)).toDF("id", "v")
    val after = Seq((1L, None), (2L, None), (3L, Some(7))).toDF("id", "v")
    val got = Snapshot.diff(before, after, "id", Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // null <=> null is TRUE (unchanged); value→null and null→value are updates
    assert(got == Seq(("U", 1L), ("U", 3L)))
  }

  test("diff of identical states is empty; diff against empty is all inserts") {
    val st = Seq((1L, 1), (2L, 2)).toDF("id", "v")
    assert(Snapshot.diff(st, st, "id", Seq("v")).count() == 0)
    val empty = st.filter(lit(false))
    val ins = Snapshot.diff(empty, st, "id", Seq("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(ins == Seq(("I", 1L), ("I", 2L)))
  }

  test("replaying the diff keys onto `before` reconstructs `after` (changelog contract)") {
    val before = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "v")
    val after = Seq((2L, 25), (3L, 30), (9L, 90)).toDF("id", "v")
    val d = Snapshot.diff(before, after, "id", Seq("v"))
    // I/U payloads come from `after`; D rows carry the delete flag
    val src = d.filter(col("op") =!= "D").join(after, "id")
        .withColumn("is_delete", lit(false)).drop("op")
      .unionByName(d.filter(col("op") === "D").join(before, "id")
        .withColumn("is_delete", lit(true)).drop("op"))
    val rebuilt = Snapshot.merge(before, src, "id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val want = after.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(rebuilt == want)
  }
}
