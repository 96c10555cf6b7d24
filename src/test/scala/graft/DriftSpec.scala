package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpecBase {

  import spark.implicits._

  private def df(rows: Seq[(String, Long, Boolean)]) =
    rows.toDF("grp", "bin", "is_ref")

  test("identical distributions give psi exactly 0") {
    val rows = for (b <- 0L to 4L; r <- Seq(true, false); _ <- 1 to 10)
      yield ("a", b, r)
    val out = Drift.psi(df(rows), "grp", "bin", "is_ref", nBins = 5).collect()
    assert(out.length === 1)
    assert(out(0).getDouble(1) === 0.0)
  }

  test("shifted distribution gives positive psi; bigger shift bigger psi") {
    // ref mass on bins 0-1, current mass on bins 3-4 (hard shift) vs a
    // mild shift (current on bins 1-2)
    def build(curBins: Seq[Long]) = df(
      (for (b <- Seq(0L, 1L); _ <- 1 to 50) yield ("a", b, true)) ++
        (for (b <- curBins; _ <- 1 to 50) yield ("a", b, false)))
    val hard = Drift.psi(build(Seq(3L, 4L)), "grp", "bin", "is_ref", 5)
      .collect()(0).getDouble(1)
    val mild = Drift.psi(build(Seq(1L, 2L)), "grp", "bin", "is_ref", 5)
      .collect()(0).getDouble(1)
    assert(hard > mild && mild > 0.0)
  }

  test("psi is symmetric under swapping reference and current") {
    val rows = (for (b <- Seq(0L, 0L, 1L); _ <- 1 to 7) yield ("a", b, true)) ++
      (for (b <- Seq(1L, 2L); _ <- 1 to 11) yield ("a", b, false))
    val fwd = Drift.psi(df(rows), "grp", "bin", "is_ref", 3)
      .collect()(0).getDouble(1)
    val swapped = Drift.psi(
      df(rows).withColumn("is_ref", !col("is_ref")), "grp", "bin", "is_ref", 3)
      .collect()(0).getDouble(1)
    assert(fwd === swapped)
    assert(fwd > 0.0)
  }

  test("bins absent from one slice stay finite; groups are independent") {
    val rows = (for (_ <- 1 to 20) yield ("a", 0L, true)) ++
      (for (_ <- 1 to 20) yield ("a", 1L, false)) ++
      (for (b <- 0L to 1L; r <- Seq(true, false)) yield ("b", b, r))
    val out = Drift.psi(df(rows), "grp", "bin", "is_ref", 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!out("a").isNaN && !out("a").isInfinite && out("a") > 1.0)
    assert(out("b") === 0.0)
  }
}
