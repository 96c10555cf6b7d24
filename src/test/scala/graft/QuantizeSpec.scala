package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("q8 clamps to [-127, 127] and rounds half up via floor(x+0.5)") {
    assert(Quantize.q8(0.0, 0.01) == 0L)
    assert(Quantize.q8(0.0151, 0.01) == 2L) // 1.51 → floor(2.01) = 2
    assert(Quantize.q8(-0.0151, 0.01) == -2L) // -1.51 → floor(-1.01) = -2
    assert(Quantize.q8(10.0, 0.01) == 127L)
    assert(Quantize.q8(-10.0, 0.01) == -127L)
  }

  test("quantize column agrees with driver-side q8 on random vectors") {
    val rnd = new scala.util.Random(3)
    val vecs = (0 until 50).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val got = vecs.toDF("id", "v")
      .select(col("id"), Quantize.quantize(col("v"), 0.005).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      val want = v.map(x => Quantize.q8(x.toDouble, 0.005))
      assert(java.util.Arrays.equals(got(id), want), s"id $id")
    }
  }

  test("sq8DistLit equals the integer distance between quantized codes") {
    val rnd = new scala.util.Random(9)
    val q = Array.fill(8)(rnd.nextDouble() - 0.5)
    val vecs = (0 until 30).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    val got = vecs.toDF("id", "v")
      .select(col("id"), Quantize.sq8DistLit(col("v"), 0.005, q).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qq = q.map(Quantize.q8(_, 0.005))
    vecs.foreach { case (id, v) =>
      val want = v.map(x => Quantize.q8(x.toDouble, 0.005)).zip(qq)
        .map { case (a, b) => (a - b) * (a - b) }.sum
      assert(got(id) == want, s"id $id")
    }
  }

  test("sq8 top-k recall vs exact kNN is high on the fixture") {
    import graft.functions.Distances
    import graft.core.{Fixtures, Tables}
    val db = Tables.embeddings(spark, sfDir)
    val exact = graft.operators.Knn.bruteForce(db,
        Distances.squaredL2Lit(col("embedding"), Fixtures.Q64), 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val sq8 = db.select(col("vec_id"),
        Quantize.sq8DistLit(col("embedding"), 0.005, Fixtures.Q64).as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact intersect sq8).size >= 8, s"recall too low: ${exact intersect sq8}")
  }
}
