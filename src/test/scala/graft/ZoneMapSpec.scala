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

  test("empty range scans zero buckets and returns zero rows") {
    val lo = lit("1899-01-01").cast("timestamp")
    val hi = lit("1899-02-01").cast("timestamp")
    val (pruned, nb) = ZoneMap.pruneScan(li, col("bucket"), col("l_shipdate"), lo, hi)
    assert(nb == 0)
    assert(pruned.count() == 0)
  }
}
