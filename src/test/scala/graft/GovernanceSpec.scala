package graft

import graft.operators.{Governance, TextAnalysis}
import org.apache.spark.sql.functions._

/** Corpus-governance operators on constructed inputs where every expected
  * row is hand-checkable: per-key caps, priority-resolved dedup, and the
  * histogram-collapsed per-group percentile (which must equal SQL
  * percent_rank computed the row-level way).
  */
class GovernanceSpec extends SparkSpecBase {
  import spark.implicits._

  test("capPerKey keeps exactly n per key in the given total order") {
    val df = Seq(
      ("a", 1L, 5), ("a", 2L, 9), ("a", 3L, 9), ("a", 4L, 1),
      ("b", 5L, 2), ("b", 6L, 3),
      ("c", 7L, 8)).toDF("k", "id", "score")
    val kept = Governance.capPerKey(df, "k", 2,
        Seq(col("score").desc, col("id").asc))
      .select("k", "id").as[(String, Long)].collect().toSet
    // a: score-9 ties broken by id → ids 2, 3; b and c are under the cap
    assert(kept == Set(("a", 2L), ("a", 3L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("priorityDedup keeps the lowest (priority, id) per digest and flags the rest") {
    val df = Seq(
      (1L, "same text", 3), // loses: priority 3
      (2L, "same text", 1), // wins: priority 1
      (3L, "same text", 1), // loses: ties priority 1, larger id
      (4L, "unique", 9)     // singleton: kept
    ).toDF("doc_id", "text", "pri")
    val out = Governance.priorityDedup(df, "text", "doc_id", col("pri"))
      .select("doc_id", "group_size", "kept_id", "is_kept")
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(out(2L) == ((2L, 3L, 2L, 1)))
    assert(out(1L) == ((1L, 3L, 2L, 0)))
    assert(out(3L) == ((3L, 3L, 2L, 0)))
    assert(out(4L) == ((4L, 1L, 4L, 1)))
  }

  test("histogram-collapsed percentile ≡ row-level percent_rank") {
    val df = Seq(
      ("en", 1L, 0.10), ("en", 2L, 0.20), ("en", 3L, 0.20), ("en", 4L, 0.90),
      ("de", 5L, 0.50), ("de", 6L, 0.60),
      ("zh", 7L, 0.30) // singleton group → pctl 0 by convention
    ).toDF("lang", "doc_id", "s")
    val got = Governance.percentileByGroup(df, "lang",
        col("s").cast("decimal(9,4)"))
      .select("doc_id", "pctl").as[(Long, Double)].collect().toMap
    // row-level reference: percent_rank over (lang ordered by s)
    val ref = df.withColumn("pr", round(percent_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("s"))), 9))
      .select("doc_id", "pr").as[(Long, Double)].collect().toMap
    assert(got == ref)
    assert(got(7L) == 0.0)
    assert(got(2L) == got(3L)) // ties share the strictly-below count
  }

  test("ngramDiversity counts total occurrences but distinct types") {
    val df = Seq(
      // "a b a b a" → trigrams: "a b a","b a b","a b a" = 3 total, 2 distinct
      (1L, "en", "a b a b a"),
      // two words → no trigram
      (2L, "en", "a b"),
      (3L, "de", "x y z") // 1 total, 1 distinct
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.ngramDiversity(df, n = 3)
      .select("lang", "n_grams", "n_distinct")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("en") == ((3L, 2L)))
    assert(out("de") == ((1L, 1L)))
  }
}
