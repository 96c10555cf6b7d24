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

  test("count-min never underestimates; exact at collision-free width") {
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val exact = toks.groupBy("term").agg(count(lit(1)).as("exact_n"))
    // narrow sketch: estimates are upper bounds
    val narrow = Freq.countMinLookup(
        Freq.countMinSketch(toks, "term", depth = 4, width = 64),
        exact, "term", depth = 4, width = 64)
      .collect()
    assert(narrow.nonEmpty)
    narrow.foreach { r =>
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact_n"),
        s"underestimate for ${r.getAs[String]("term")}")
    }
    // wide sketch (collision-free at fixture vocabulary size): est == exact
    val wide = Freq.countMinLookup(
        Freq.countMinSketch(toks, "term", depth = 4, width = 1 << 20),
        exact, "term", depth = 4, width = 1 << 20)
      .collect()
    wide.foreach { r =>
      assert(r.getAs[Long]("cm_est") === r.getAs[Long]("exact_n"))
    }
  }

  test("count-min lookup of an absent key is bounded by collisions (0 when empty cells)") {
    import spark.implicits._
    val items = Seq.fill(100)("x").toDF("k")
    val sketch = Freq.countMinSketch(items, "k", depth = 4, width = 1 << 16)
    val probe = Seq("never-seen-key").toDF("k")
    val est = Freq.countMinLookup(sketch, probe, "k", depth = 4, width = 1 << 16)
      .collect()(0).getAs[Long]("cm_est")
    assert(est === 0L)
  }
}
