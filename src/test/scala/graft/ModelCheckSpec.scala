package graft

import graft.operators.AsOfJoin
import graft.streaming.Sessionize
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Model-based randomized checks: the distributed operators against
  * straightforward in-memory Scala models on seeded random data with
  * adversarial shapes (ties, empty keys, bursts). */
class ModelCheckSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(77)

  test("as-of join equals the per-row scan model on random data with ties (5 trials)") {
    for (trial <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(5)
      val left = (0 until 100).map { i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, 1000L + rnd.nextInt(50) * 10L)
      } // (eid, key, t)
      val right = (0 until 60).map { j =>
        (j.toLong, rnd.nextInt(nKeys + 1).toLong, 1000L + rnd.nextInt(50) * 10L, rnd.nextDouble())
      } // (rid, key, t, v) — key nKeys never matches
      val lDf = left.map { case (e, k, t) => (e, k, new Timestamp(t * 1000)) }.toDF("eid", "k", "t")
      val rDf = right.map { case (r, k, t, v) => (r, k, new Timestamp(t * 1000), v) }
        .toDF("rid", "rk", "rt", "v")
      val got = AsOfJoin.asOf(lDf, rDf, "k", "rk", "t", "rt", Seq("rid", "v"), "rid")
        .select("eid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // model: max (t, rid) among right rows with same key, t <= left t
      val model = left.map { case (e, k, t) =>
        val cands = right.filter(r => r._2 == k && r._3 <= t)
        e -> (if (cands.isEmpty) -1L else cands.maxBy(r => (r._3, r._1))._1)
      }.toMap
      assert(got == model, s"trial $trial")
    }
  }

  test("batch sessionization equals the sort-and-split model (5 trials)") {
    val gapMin = 30
    for (trial <- 1 to 5) {
      val events = (0 until 200).map { i =>
        (i.toLong, rnd.nextInt(4).toLong,
          new Timestamp((100000L + rnd.nextInt(500) * 60L) * 1000L), rnd.nextInt(100) / 10.0)
      }
      val df = events.toDF("event_id", "user_id", "ts", "value")
      val got = Sessionize.batch(df, gapMin)
        .select("user_id", "session_idx", "session_start", "session_end", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      // model: per user, sort by (tse, event_id), split on gap > 30min
      val model = events.groupBy(_._2).flatMap { case (user, evs) =>
        val sorted = evs.map(e => (e._3.getTime / 1000L, e._1)).sortBy(identity)
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long)]]) { (acc, e) =>
          acc match {
            case cur :: rest if e._1 - cur.last._1 <= gapMin * 60L => (cur :+ e) :: rest
            case _ => List(e) :: acc
          }
        }.reverse
        sessions.zipWithIndex.map { case (s, i) =>
          (user, i.toLong, s.head._1, s.last._1, s.length.toLong)
        }
      }.toSet
      assert(got == model, s"trial $trial")
    }
  }
}
