package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile computes nulls/distincts/typed bounds in one pass") {
    val df = Seq(
      (Some(1L), Some(2.5), Some("b")),
      (Some(2L), None, Some("a")),
      (Some(2L), Some(7.5), None),
      (None, Some(2.5), Some("c"))
    ).toDF("k", "v", "s")
    val p = Profile.profile(df, Seq(
        "k" -> Profile.Num, "v" -> Profile.Num, "s" -> Profile.Str))
      .collect().map(r => r.getString(0) -> r).toMap

    val k = p("k")
    assert(k.getLong(1) == 1 && k.getLong(2) == 2)          // nulls, distinct
    assert(k.getDouble(3) == 1.0 && k.getDouble(4) == 2.0)  // min/max num
    assert(k.isNullAt(5) && k.isNullAt(6))                  // no string bounds
    val v = p("v")
    assert(v.getLong(1) == 1 && v.getLong(2) == 2)
    assert(v.getDouble(3) == 2.5 && v.getDouble(4) == 7.5)
    val s = p("s")
    assert(s.getLong(1) == 1 && s.getLong(2) == 3)
    assert(s.isNullAt(3) && s.isNullAt(4))
    assert(s.getString(5) == "a" && s.getString(6) == "c")
  }

  test("profile timestamp bounds are epoch seconds") {
    val df = Seq("2020-01-01 00:00:00", "2021-06-01 00:00:00")
      .toDF("t").select(col("t").cast("timestamp").as("t"))
    val r = Profile.profile(df, Seq("t" -> Profile.Ts)).collect().head
    assert(r.getDouble(3) == 1577836800.0 && r.getDouble(4) == 1622505600.0)
  }

  test("audit counts injected orphans and duplicate keys exactly") {
    val parent = Seq(1L, 2L, 3L).toDF("pid")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 9L), (13L, 8L)).toDF("cid", "fk")
    val dup = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("pk")
    val got = Profile.audit(Seq(
        "child_orphans" -> Profile.orphans(child, parent, "fk", "pid"),
        "dup_pks" -> Profile.dupKeys(dup, "pk"),
        "clean" -> Profile.orphans(Seq(1L, 3L).toDF("fk2"), parent, "fk2", "pid")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("child_orphans" -> 2L, "dup_pks" -> 2L, "clean" -> 0L))
  }
}
