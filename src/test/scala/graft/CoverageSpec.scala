package graft

import graft.operators.Coverage
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection: the distributed rounds must replay
  * the in-memory greedy rule exactly (max marginal distinct-token gain,
  * ties to the lowest doc id, stop at zero gain).
  */
class CoverageSpec extends SparkSpecBase {
  import spark.implicits._

  private def refGreedy(sets: Map[Long, Set[String]], k: Int): Seq[(Int, Long, Long)] = {
    var covered = Set.empty[String]
    var picks = Vector.empty[(Int, Long, Long)]
    var done = false
    while (!done && picks.size < k) {
      val gains = sets.map { case (id, s) => (id, (s -- covered).size.toLong) }
      val (id, g) = gains.toSeq.minBy { case (id, g) => (-g, id) }
      if (g == 0L) done = true
      else {
        picks = picks :+ ((picks.size, id, g))
        covered ++= sets(id)
      }
    }
    picks
  }

  test("selection matches the in-memory greedy replay on seeded random corpora") {
    val rnd = new scala.util.Random(61)
    for (trial <- 0 until 3) {
      val vocab = (0 until 40).map(i => s"w$i")
      val docs = (0 until 30).map { i =>
        val words = Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        (i.toLong + 5, words.mkString(" "))
      }
      val got = Coverage.selectByWordCoverage(docs.toDF("doc_id", "text"), k = 6)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }.toMap
      assert(got === refGreedy(sets, 6), s"trial $trial")
    }
  }

  test("gains are non-increasing (submodularity under the shared covered set)") {
    val rnd = new scala.util.Random(3)
    val docs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(8)(s"t${rnd.nextInt(60)}").mkString(" "))
    }
    val gains = Coverage.selectByWordCoverage(docs.toDF("doc_id", "text"), k = 8)
      .collect().map(_.getLong(2))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      s"gains must not increase: ${gains.mkString(",")}")
  }

  test("early stop once every token is covered; empty input selects nothing") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b"), (3L, "c d"), (4L, "b c")).toDF("doc_id", "text")
    val got = Coverage.selectByWordCoverage(docs, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0, 1L, 4L)), s"doc 1 covers everything: $got")
    assert(Coverage.selectByWordCoverage(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), k = 3).count() === 0L)
  }
}
