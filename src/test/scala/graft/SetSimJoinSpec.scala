package graft

import graft.operators.{Dedup, SetSimJoin}
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  private def brute(df: org.apache.spark.sql.DataFrame, t: Double) = {
    val ws = df.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("wset"))
    ws.as("a").join(ws.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        Dedup.jaccard(col("a.wset"), col("b.wset")).as("jac"))
      .filter(col("jac") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("prefix-filter join equals brute force on random corpora (3 thresholds)") {
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val docs = (0 until 80).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val got = SetSimJoin.jaccardJoin(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute(docs, t), s"threshold $t")
    }
  }

  test("identical docs pair at jaccard 1.0; disjoint docs never pair") {
    val docs = Seq((1L, "x y z"), (2L, "x y z"), (3L, "p q r")).toDF("doc_id", "text")
    val got = SetSimJoin.jaccardJoin(docs, 0.99).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("banded simhash pairing equals brute hamming filter on fixture docs") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    for (maxH <- Seq(3, 8)) {
      val got = Dedup.simHashNearDupPairs(docs, "text", "doc_id", maxHamming = maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val sig = Dedup.simHash(docs, "text", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val brute = (for {
        (ia, sa) <- sig; (ib, sb) <- sig if ia < ib
        h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
      } yield (ia, ib, h)).toSet
      assert(got == brute, s"maxHamming $maxH")
    }
  }

  private def bruteContainment(df: org.apache.spark.sql.DataFrame, t: Double) = {
    val ws = df.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("wset"))
    ws.as("a").join(ws.as("b"), col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        (size(array_intersect(col("a.wset"), col("b.wset"))).cast("double")
          / size(col("a.wset")).cast("double")).as("containment"))
      .filter(col("containment") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("asymmetric containment join equals brute force on random corpora (3 thresholds)") {
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val docs = (0 until 80).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.4, 0.7, 0.9)) {
      val got = SetSimJoin.containmentJoin(docs, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == bruteContainment(docs, t), s"threshold $t")
    }
  }

  test("containment is directed: excerpt ⊂ full pairs one way at t=1.0") {
    val docs = Seq((1L, "x y"), (2L, "x y z w"), (3L, "p q")).toDF("doc_id", "text")
    val got = SetSimJoin.containmentJoin(docs, 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("fixture smoke: exact prefix-filter pairs match brute force at t=0.5") {
    val docs = graft.core.Tables.documents(spark, sfDir).filter(col("doc_id") % 5 === 0)
    val got = SetSimJoin.jaccardJoin(docs, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = brute(docs, 0.5).map(p => (p._1, p._2))
    assert(got == want)
    assert(want.nonEmpty, "fixture should produce some similar pairs at t=0.5")
  }
}
