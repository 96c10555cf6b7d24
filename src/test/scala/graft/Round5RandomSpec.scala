package graft

import graft.operators.{AsOfJoin, TimeSeries}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized equivalence for the round-5 operators: the Spark
  * implementations vs driver-side brute-force references over irregular
  * data (duplicate timestamps, missing keys, singleton partitions) that
  * hand-written fixtures under-sample. */
class Round5RandomSpec extends SparkSpecBase {
  import spark.implicits._

  test("asOfNearest ≡ brute force nearest (ties → earlier) over random event sets") {
    val rnd = new Random(42)
    for (round <- 1 to 3) {
      val nKeys = 5
      val left = (1 to 120).map { i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(500).toLong)
      } // (lid, key, t) -- coarse t domain forces duplicate timestamps
      val right = (1 to 150).map { i =>
        (1000L + i, rnd.nextInt(nKeys + 1).toLong, rnd.nextInt(500).toLong)
      } // one key never on the left, one left key maybe absent here
      val lDf = left.toDF("lid", "k", "t")
        .select(col("lid"), col("k"), col("t").cast("timestamp").as("ts"))
      val rDf = right.toDF("rid", "rk", "rt0")
        .select(col("rid"), col("rk"), col("rt0").cast("timestamp").as("rts"))
      val got = AsOfJoin.asOfNearest(lDf, rDf, "k", "rk", "ts", "rts",
          payloadR = Seq("rid"), tiebreakR = "rid")
        .select("lid", "rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      // brute reference: min |dt|; tie -> smaller rt (backward); within
      // equal (dt, side) the operator keeps max rid backward / min rid
      // forward, mirroring asOf's per-direction tiebreak
      val want = left.map { case (lid, k, t) =>
        val cands = right.filter(_._2 == k)
        if (cands.isEmpty) lid -> -1L
        else {
          val best = cands.minBy { case (rid, _, rt) =>
            val dt = math.abs(rt - t)
            val backward = rt <= t
            // order: distance, then backward-before-forward, then the
            // direction's own rid preference
            (dt, if (backward) 0 else 1, if (backward) -rid else rid)
          }
          lid -> best._1
        }
      }.toMap
      assert(got == want, s"round $round")
    }
  }

  test("longestDailyStreak ≡ brute force over random day sets") {
    val rnd = new Random(7)
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(8).toLong, (19700 + rnd.nextInt(40)).toLong * 86400L)
    }
    val df = rows.toDF("uid", "tse")
      .select(col("uid"), col("tse").cast("timestamp").as("ts"))
    val got = TimeSeries.longestDailyStreak(df, "uid", "ts")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = rows.groupBy(_._1).map { case (uid, rs) =>
      val days = rs.map(_._2 / 86400L).distinct.sorted
      val runs = days.foldLeft(List.empty[Long]) {
        case (h :: tl, d) if days.contains(d - 1) => (h + 1) :: tl
        case (acc, _) => 1L :: acc
      }
      uid -> (days.size.toLong, runs.max)
    }
    assert(got == want)
  }

  test("rollingMedian ≡ brute per partition over random widths") {
    val rnd = new Random(11)
    for (width <- Seq(1, 2, 5, 9)) {
      val rows = (1 to 200).map { i =>
        (rnd.nextInt(3).toLong, i.toLong, math.rint(rnd.nextDouble() * 100) / 10.0)
      }
      val df = rows.toDF("g", "i", "v")
      val got = TimeSeries.rollingMedian(df, Seq(col("g")), col("i"), col("v"),
          width, "med").select("g", "i", "med").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val sortedRows = rs.sortBy(_._2)
        sortedRows.indices.map { ix =>
          val win = sortedRows.slice(math.max(0, ix - width + 1), ix + 1)
            .map(_._3).sorted
          val n = win.length
          val med = if (n % 2 == 1) win(n / 2)
            else (win(n / 2 - 1) + win(n / 2)) / 2.0
          (g, sortedRows(ix)._2) -> med
        }
      }
      assert(got == want, s"width $width")
    }
  }
}
