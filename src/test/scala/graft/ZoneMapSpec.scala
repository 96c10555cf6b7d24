package graft

import graft.index.ZoneMap
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkSpecBase {

  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .withColumn("bucket",
      (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).cast("long"))

  test("pruned range scan equals the plain filter, for any bucketing") {
    val lo = lit("1996-03-01").cast("timestamp")
    val hi = lit("1996-06-01").cast("timestamp")
    val (pruned, nb) = ZoneMap.pruneScan(li, col("bucket"), col("l_shipdate"), lo, hi)
    val plain = li.filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
    assert(pruned.count() == plain.count())
    assert(pruned.agg(sum("l_orderkey")).head.getLong(0) ==
      plain.agg(sum("l_orderkey")).head.getLong(0))
    // skipping is real: only the 3 overlapping month buckets are scanned
    val total = li.select("bucket").distinct().count()
    assert(nb.toLong < total, s"no buckets skipped ($nb of $total)")
    assert(nb == 3)
  }

  test("pruning also holds under a bucketing UNcorrelated with the value") {
    val lo = lit("1996-03-01").cast("timestamp")
    val hi = lit("1996-04-01").cast("timestamp")
    val byKey = li.withColumn("bucket", col("l_orderkey") % 16)
    val (pruned, nb) = ZoneMap.pruneScan(byKey, col("bucket"), col("l_shipdate"), lo, hi)
    val plain = byKey.filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
    assert(pruned.count() == plain.count())
    // uncorrelated layout: every bucket overlaps — nothing skipped, still correct
    assert(nb == 16)
  }

  test("rows with a NULL layout key are never silently skipped") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), 10L), (Some(1L), 20L), (Some(2L), 50L),
      (None: Option[Long], 15L), (None: Option[Long], 90L)
    ).toDF("bucket", "v")
    val (pruned, nb) = ZoneMap.pruneScan(df, col("bucket"), col("v"), lit(10L), lit(30L))
    // null bucket spans [15, 90] → overlaps; its qualifying row (15) must
    // appear exactly like the plain filter's
    val got = pruned.select("v").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(10L, 15L, 20L))
    assert(nb == 2) // bucket 1 and the NULL bucket; bucket 2 skipped
  }

  test("empty range scans zero buckets and returns zero rows") {
    val lo = lit("1899-01-01").cast("timestamp")
    val hi = lit("1899-02-01").cast("timestamp")
    val (pruned, nb) = ZoneMap.pruneScan(li, col("bucket"), col("l_shipdate"), lo, hi)
    assert(nb == 0)
    assert(pruned.count() == 0)
  }

  test("incremental stats merge equals recompute over the union") {
    val a = li.filter(col("l_orderkey") % 2 === 0)
    val b = li.filter(col("l_orderkey") % 2 =!= 0)
    val merged = ZoneMap.mergeStats(
        ZoneMap.stats(a, col("bucket"), col("l_shipdate")),
        ZoneMap.stats(b, col("bucket"), col("l_shipdate")))
      
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    val full = ZoneMap.stats(li, col("bucket"), col("l_shipdate"))

      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    assert(merged == full)
  }

  test("z-order layout makes zone maps selective on BOTH dimensions (OPTIMIZE ZORDER shape)") {
    import graft.index.{Grid, GridConfig}
    import org.apache.spark.sql.expressions.Window
    // 10k points on a 100x100 grid. Row-major layout clusters y only
    // (y = id/100 is monotonic in id, x = id%100 cycles every bucket);
    // sorting by the z-order curve clusters BOTH, so a 2-D box consults
    // far fewer buckets via the x-map ∩ y-map skip decision.
    val pts = spark.range(10000).select(col("id"),
      (col("id") % 100).cast("double").as("x"),
      (col("id") / 100).cast("long").cast("double").as("y"))
    val cfg = GridConfig(dim = 2, lower = 0.0, upper = 100.0,
      partsPerDim = 16, gridDims = 2)
    val z = Grid.zCellId(array(col("x").cast("float"), col("y").cast("float")), cfg)
    def bucketize(ordered: org.apache.spark.sql.DataFrame) = ordered
      .withColumn("bucket",
        ((row_number().over(Window.orderBy(col("__ord"))) - 1) / 100).cast("long"))
    val rowMajor = bucketize(pts.withColumn("__ord", col("id")))
    val zOrder = bucketize(pts.withColumn("__ord", z))
    def bucketsTouched(df: org.apache.spark.sql.DataFrame): Set[Any] = {
      val bx = ZoneMap.candidateBuckets(
        ZoneMap.stats(df, col("bucket"), col("x")), lit(10.0), lit(20.0)).toSet
      val by = ZoneMap.candidateBuckets(
        ZoneMap.stats(df, col("bucket"), col("y")), lit(10.0), lit(20.0)).toSet
      bx intersect by
    }
    val rowTouched = bucketsTouched(rowMajor)
    val zTouched = bucketsTouched(zOrder)
    // row-major: the x-map is useless (every bucket spans all of x), so
    // only the y constraint prunes (~10 of 100 buckets); z-order prunes
    // on both (~the box's share of the curve)
    assert(zTouched.size < rowTouched.size,
      s"z-order touched ${zTouched.size}, row-major ${rowTouched.size}")
    // and the pruned scan is still exact on the z layout
    val exact = zOrder.filter(col("x") >= 10.0 && col("x") < 20.0 &&
      col("y") >= 10.0 && col("y") < 20.0).count()
    val pruned = zOrder
      .filter(col("bucket").isin(zTouched.toSeq: _*))
      .filter(col("x") >= 10.0 && col("x") < 20.0 &&
        col("y") >= 10.0 && col("y") < 20.0).count()
    assert(pruned === exact && exact === 100L)
  }
}
