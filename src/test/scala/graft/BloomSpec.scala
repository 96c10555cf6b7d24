package graft

import graft.operators.Bloom
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpecBase {
  import spark.implicits._

  test("bloom filter has no false negatives: every inserted key passes the probe") {
    val keys = (0L until 500L).map(_ * 13L + 1L).toDF("k")
    val bits = Bloom.buildBits(keys, "k", numBits = 1 << 14, numHashes = 3)
    val missed = keys.filter(!Bloom.mightContain(bits, 1 << 14, 3)(col("k"))).count()
    assert(missed == 0)
  }

  test("bloom filter rejects most absent keys (false-positive rate sane)") {
    val keys = (0L until 500L).map(_ * 13L + 1L).toDF("k")
    val bits = Bloom.buildBits(keys, "k", numBits = 1 << 16, numHashes = 3)
    // disjoint probe set (13k+1 vs 13k+5 residues never collide)
    val absent = (0L until 5000L).map(_ * 13L + 5L).toDF("k")
    val passed = absent.filter(Bloom.mightContain(bits, 1 << 16, 3)(col("k"))).count()
    // 500 keys * 3 bits in 65536 → expected fp rate well under 1%
    assert(passed < 100, s"false-positive count too high: $passed")
  }

  test("prefilterJoin is row-identical to the plain join") {
    val big = (0L until 3000L).map(i => (i, i % 97L)).toDF("row_id", "bk")
    val small = (0L until 97L by 5L).map(k => (k, s"dim_$k")).toDF("sk", "name")
    val pre = Bloom.prefilterJoin(big, small, "bk", "sk", numBits = 1 << 10)
      .select("row_id", "bk", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = big.join(small, col("bk") === col("sk"))
      .select("row_id", "bk", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(pre == plain)
    assert(pre.nonEmpty)
  }

  test("probe stays a native expression (no UDF in the plan)") {
    val bits = new Array[Long]((1 << 16) / 64)
    val df = (0L until 10L).toDF("k").filter(Bloom.mightContain(bits, 1 << 16, 3)(col("k")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
