package graft

import graft.core.Tables
import graft.operators.Freq
import org.apache.spark.sql.functions._

class FreqSpec extends SparkSpecBase {
  import spark.implicits._

  test("heavy hitters equals exact groupBy+HAVING on a skewed distribution") {
    // zipf-ish: value v appears ~ 5000/v times
    val data = (1 to 50).flatMap(v => Seq.fill(5000 / v)(s"item_$v"))
    val df = spark.createDataset(scala.util.Random.shuffle(data)).toDF("k")
      .repartition(8)
    val minShare = 0.02
    val got = Freq.heavyHitters(df, "k", minShare)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = data.size
    val expected = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, n) => n >= math.ceil(minShare * total).toLong }
    assert(got == expected, s"got=$got expected=$expected")
    assert(got.nonEmpty)
  }

  test("heavy hitters on fixture event types: every type is frequent, counts exact") {
    val ev = Tables.events(spark, sfDir)
    val got = Freq.heavyHitters(ev, "event_type", 0.1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected) // 5 types, all ≈20% share
  }

  test("no false positives below the threshold; nulls ignored") {
    val df = (Seq.fill(98)("hot") ++ Seq("cold", "cold") ++ Seq(null))
      .toDF("k").repartition(4)
    val got = Freq.heavyHitters(df, "k", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 98L))
  }
}
