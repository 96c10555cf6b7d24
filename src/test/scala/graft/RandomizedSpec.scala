package graft

import graft.functions.Distances
import graft.index.{Grid, GridConfig}
import graft.operators.Knn
import org.apache.spark.sql.functions._

/** Seeded randomized (property-style) tests over generated data — the
  * reference tests only unseeded random inserts (SURVEY §5); these pin the
  * stronger invariants on adversarial inputs: duplicates, boundary values,
  * out-of-bounds vectors, tiny/degenerate sets. */
class RandomizedSpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  private def randVec(dim: Int, oob: Boolean): Array[Float] =
    Array.fill(dim)((rnd.nextDouble() * (if (oob) 4.0 else 2.0) - (if (oob) 2.0 else 1.0)).toFloat)

  test("distances: column expressions equal driver-side math on random vectors (100 trials)") {
    val dim = 6
    val rows = (0L until 100L).map(i => (i, randVec(dim, oob = i % 7 == 0)))
    val df = rows.toDF("vec_id", "embedding")
    val q = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
    val invDiag = Array.fill(dim)(0.5 + rnd.nextDouble())
    val got = df.select(col("vec_id"),
        Distances.squaredL2Lit(col("embedding"), q).as("l2"),
        Distances.l1Lit(col("embedding"), q).as("l1"),
        Distances.lInfLit(col("embedding"), q).as("linf"),
        Distances.mahalanobisDiagLit(col("embedding"), q, invDiag).as("maha"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    rows.foreach { case (id, v) =>
      val vd = v.map(_.toDouble)
      assert(got(id)._1 == Distances.squaredL2(vd, q), s"l2 id=$id")
      assert(got(id)._2 == Distances.l1(vd, q), s"l1 id=$id")
      assert(got(id)._3 == Distances.lInf(vd, q), s"linf id=$id")
      assert(got(id)._4 == Distances.mahalanobisDiag(vd, q, invDiag), s"maha id=$id")
    }
  }

  test("pruned kNN equals brute force on random data with duplicates and OOB vectors (10 configs)") {
    for (trial <- 1 to 10) {
      val dim = 2 + rnd.nextInt(3)
      val cfg = GridConfig(dim = dim, lower = -1.0, upper = 1.0,
        partsPerDim = 2 + rnd.nextInt(3), gridDims = 1 + rnd.nextInt(dim))
      val n = 1 + rnd.nextInt(60)
      val base = (0L until n.toLong).map(i => (i, randVec(dim, oob = rnd.nextInt(5) == 0)))
      // inject exact duplicates (reference tests allow duplicate positions)
      val rows = base ++ base.take(rnd.nextInt(4)).map { case (i, v) => (i + n, v) }
      val df = rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
      val indexed = Grid.withCellId(df, "embedding", cfg)
      val q = Array.fill(dim)(rnd.nextDouble() * 2.4 - 1.2)
      val k = 1 + rnd.nextInt(rows.length + 2)
      val pruned = Knn.prunedSearchDf(spark, indexed, cfg, q, k,
        bruteForceThreshold = 0L)
        .select("vec_id").as[Long].collect().toSeq
      val brute = Knn.bruteForce(df, Distances.squaredL2Lit(col("embedding"), q), k)
        .select("vec_id").as[Long].collect().toSeq
      assert(pruned == brute, s"trial $trial: cfg=$cfg n=${rows.length} k=$k")
    }
  }

  test("grid bucketing: every row lands in exactly one cell, within [0, numCells)") {
    val dim = 4
    val cfg = GridConfig(dim = dim, lower = -1.0, upper = 1.0, partsPerDim = 3, gridDims = 3)
    val rows = (0L until 200L).map(i => (i, randVec(dim, oob = i % 3 == 0)))
    val cells = Grid.withCellId(rows.toDF("vec_id", "embedding"), "embedding", cfg)
      .select("cell_id").as[Long].collect()
    assert(cells.length == 200)
    assert(cells.forall(c => c >= 0 && c < cfg.numCells))
  }
}
