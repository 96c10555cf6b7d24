package graft

import graft.plans.{KnnJoinExec, KnnJoinPlan}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The rank-bound pushdown rule: Filter(rn <= m) above the kNN-join node
  * must shrink the operator's k (heap size, shuffle rows) to m without
  * changing any returned row. */
class KnnTopKPushdownSpec extends SparkSpecBase {

  private lazy val db = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private lazy val queries = db.filter(col("vec_id") < 4)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private def withoutAqe[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
  private def execK(df: DataFrame): Seq[Int] =
    df.queryExecution.executedPlan.collect { case e: KnnJoinExec => e.k }

  test("rn <= m shrinks k to m; rows equal the directly-built top-m") {
    withoutAqe {
      val filtered = KnnJoinPlan.join(queries, db, k = 10).filter(col("rn") <= 3)
      assert(execK(filtered) == Seq(3), s"plan k: ${execK(filtered)}")
      val direct = KnnJoinPlan.join(queries, db, k = 3)
      assert(filtered.collect().toSet === direct.collect().toSet)
    }
  }

  test("rn = 1 shrinks to a 1-NN scan; the equality filter still applies") {
    withoutAqe {
      val nn1 = KnnJoinPlan.join(queries, db, k = 10).filter(col("rn") === 1)
      assert(execK(nn1) == Seq(1))
      val rows = nn1.collect()
      assert(rows.length == 4 && rows.forall(_.getInt(3) == 1))
    }
  }

  test("conjunction: rank bound extracted, other conjunct preserved") {
    withoutAqe {
      val f = KnnJoinPlan.join(queries, db, k = 10)
        .filter(col("dist") > 0.0 && col("rn") < 3)
      assert(execK(f) == Seq(2))
      val direct = KnnJoinPlan.join(queries, db, k = 2)
        .filter(col("dist") > 0.0)
      assert(f.collect().toSet === direct.collect().toSet)
    }
  }

  test("a non-rank filter does not shrink k") {
    withoutAqe {
      val f = KnnJoinPlan.join(queries, db, k = 5).filter(col("dist") >= 0.0)
      assert(execK(f) == Seq(5))
      assert(f.count() == 4L * 5)
    }
  }

  test("lower bounds and unsatisfiable bounds are left alone") {
    withoutAqe {
      val f = KnnJoinPlan.join(queries, db, k = 5).filter(col("rn") >= 2)
      assert(execK(f) == Seq(5))
      assert(f.count() == 4L * 4)
      val empty = KnnJoinPlan.join(queries, db, k = 5).filter(col("rn") <= 0)
      assert(empty.count() == 0L)
    }
  }

  test("Long literal bound (rn <= 3L, coerced under a cast) still shrinks") {
    withoutAqe {
      val f = KnnJoinPlan.join(queries, db, k = 10).filter(col("rn") <= lit(3L))
      assert(execK(f) == Seq(3), s"plan k: ${execK(f)}")
      assert(f.collect().toSet ===
        KnnJoinPlan.join(queries, db, k = 3).collect().toSet)
    }
  }

  test("bound reaches through a trivial Project (select/rename)") {
    withoutAqe {
      val f = KnnJoinPlan.join(queries, db, k = 10)
        .select(col("query_id"), col("vec_id"), col("rn").as("rank"))
        .filter(col("rank") <= 2)
      assert(execK(f) == Seq(2), s"plan k: ${execK(f)}")
      assert(f.count() == 4L * 2)
    }
  }
}
