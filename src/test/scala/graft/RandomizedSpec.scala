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

  test("banded MIPS pruned equals brute on random weights, bands, and queries (10 configs)") {
    for (trial <- 1 to 10) {
      val dim = 2 + rnd.nextInt(4)
      val n = 1 + rnd.nextInt(80)
      val nBands = 1 + rnd.nextInt(6)
      val rows = (0L until n.toLong).map { i =>
        (i, randVec(dim, oob = rnd.nextInt(6) == 0),
          rnd.nextDouble() * 5.0,              // weight >= 0, continuous
          rnd.nextInt(nBands).toLong)           // band NOT derived from the
      }                                         // weight — bound still holds
      val df = rows.toDF("vec_id", "embedding", "weight", "band")
        .withColumn("label", lit(0))
      val q = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val k = 1 + rnd.nextInt(n + 2)
      val pruned = graft.operators.Mips.prunedTopK(spark, df, q, k,
          bruteForceThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val brute = df
        .withColumn("dot", col("weight") * Distances.dotLit(col("embedding"), q))
        .orderBy(col("dot").desc, col("vec_id").asc).limit(k)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("dot"))).toSeq
      assert(pruned == brute, s"trial $trial: dim=$dim n=$n bands=$nBands k=$k")
    }
  }

  test("repeated n-gram spans equal a driver-side reference on random corpora (5 trials)") {
    val vocab = Array("a", "b", "c", "d", "e")
    for (trial <- 1 to 5) {
      val n = 3 + rnd.nextInt(3)
      val docs = (0L until (8 + rnd.nextInt(8)).toLong).map { i =>
        (i, Seq.fill(2 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val got = graft.operators.Dedup.repeatedNgramSpans(
          docs.toDF("doc_id", "text"), n = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // reference: brute gram df + interval merge in plain Scala
      val grams = docs.flatMap { case (id, text) =>
        val w = text.split(" ")
        (0 to w.length - n).map(p => (id, p, w.slice(p, p + n).mkString(" ")))
      }
      val hot = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      val expected = docs.flatMap { case (id, _) =>
        val ps = grams.filter(g => g._1 == id && hot(g._3)).map(_._2).sorted
        // merge [p, p+n) intervals that touch or overlap
        ps.foldLeft(List.empty[(Int, Int, Int)]) {
          case ((s, e, c) :: tail, p) if p <= e => (s, math.max(e, p + n), c + 1) :: tail
          case (acc, p) => (p, p + n, 1) :: acc
        }.map { case (s, e, c) => (id, s.toLong, e.toLong, c.toLong) }
      }.toSet
      assert(got == expected, s"trial $trial n=$n")
    }
  }

  test("bloom decontam: exact ⊆ bloom on random corpora; flag counts consistent (5 trials)") {
    val vocab = Array("a", "b", "c", "d", "e", "f", "g", "h")
    for (trial <- 1 to 5) {
      def mkDocs(base: Long, k: Int) = (base until base + k).map { i =>
        (i, Seq.fill(4 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val bench = mkDocs(100L, 3 + rnd.nextInt(3)).toDF("doc_id", "text")
      val train = mkDocs(0L, 10 + rnd.nextInt(10)).toDF("doc_id", "text")
      val exact = graft.operators.Decontam.ngramOverlap(train, bench, n = 4)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      val bloom = graft.operators.Decontam.bloomNgramFlags(train, bench, n = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(bloom.length == exact.size, s"trial $trial row count")
      bloom.foreach { case (id, nf, flag) =>
        assert(flag == (nf > 0), s"trial $trial doc $id flag/count")
        if (exact(id)) assert(flag, s"trial $trial doc $id: exact hit missed by bloom")
      }
    }
  }

  test("epochShuffle: bijection and seed-sensitivity on random id sets and shard counts (5 trials)") {
    for (trial <- 1 to 5) {
      val n = 20 + rnd.nextInt(200)
      val shards = 1 + rnd.nextInt(16)
      val seed = rnd.nextInt(1000)
      // non-contiguous ids exercise the hash, not the id layout
      val ids = Seq.fill(n)(rnd.nextLong().abs % 1000000L).distinct
      val df = ids.toDF("doc_id")
      val out = graft.operators.Governance.epochShuffle(
          df, col("doc_id"), seed = seed, nShards = shards)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      assert(out.length == ids.length)
      assert(out.forall(t => t._2 >= 0 && t._2 < shards), s"trial $trial shard range")
      assert(out.map(t => (t._2, t._3)).distinct.length == out.length, s"trial $trial bijection")
      out.groupBy(_._2).foreach { case (_, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (1 to rows.length), s"trial $trial dense positions")
      }
      if (ids.length > 1) {
        val out2 = graft.operators.Governance.epochShuffle(
            df, col("doc_id"), seed = seed + 1, nShards = shards)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        assert(out.sortBy(_._1).toSeq != out2.sortBy(_._1).toSeq || ids.length < 4,
          s"trial $trial seed-insensitive")
      }
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
