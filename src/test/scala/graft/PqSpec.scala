package graft

import graft.core.{Fixtures, Tables}
import graft.functions.Distances
import graft.operators.{Knn, Pq}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpecBase {
  import Fixtures.{Dim, Q64}

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val model = Pq.train(emb, Dim, m = 16, ksub = 32)
  private lazy val encoded = Pq.encode(emb, model).persist()

  test("training is deterministic and shapes are right") {
    val again = Pq.train(emb, Dim, m = 16, ksub = 32)
    assert(model.codebooks.length == 16)
    assert(model.codebooks.forall(_.length == 32))
    assert(model.codebooks.forall(_.forall(_.length == 4)))
    assert(model.codebooks.flatten.flatten.toSeq == again.codebooks.flatten.flatten.toSeq)
  }

  test("encode: every code is the true argmin of its subspace (vs driver recompute)") {
    val rows = encoded.select(col("vec_id"), col("embedding"), col("pq_codes"))
      .limit(50).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val codes = r.getSeq[Int](2)
      (0 until model.m).foreach { j =>
        val sub = v.slice(j * model.dsub, (j + 1) * model.dsub)
        val dists = model.codebooks(j).map { cb =>
          sub.zip(cb).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        assert(codes(j) == dists.indexOf(dists.min),
          s"vec ${r.getLong(0)} subspace $j")
      }
    }
  }

  test("ADC column distance equals the driver-side LUT sum") {
    val lut = Pq.adcTable(Q64, model)
    val rows = encoded
      .select(col("pq_codes"), Pq.adcDist(col("pq_codes"), lut).as("adc"))
      .limit(100).collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](0)
      val expect = (0 until model.m).map(j => lut(j)(codes(j))).sum
      assert(r.getDouble(1) == expect)
    }
  }

  test("PQ search with refine reaches high recall vs brute force") {
    val k = 10
    val brute = Knn.bruteForce(emb, Distances.squaredL2Lit(col("embedding"), Q64), k)
      .collect().map(_.getLong(0)).toSet
    val pq = Pq.search(encoded, model, Q64, k, refine = 100)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute intersect pq).size.toDouble / k
    assert(recall >= 0.8, s"recall $recall < 0.8 (pq=$pq brute=$brute)")
  }

  test("IVFPQ composition: probed-cell ADC search still finds the neighborhood") {
    import graft.operators.Ann
    val cents = Ann.sampleCentroids(emb, 8)
    val both = Ann.assign(encoded, cents)
    val k = 10
    // with ALL cells probed, IVFPQ degenerates to plain PQ search — exact match
    val allCells = Pq.ivfPqSearch(both, cents, model, Q64, k, nprobe = 8, refine = 100)
      .collect().map(_.getLong(0)).toSeq
    val plainPq = Pq.search(encoded, model, Q64, k, refine = 100)
      .collect().map(_.getLong(0)).toSeq
    assert(allCells == plainPq)
    // with nprobe=3 of 8, recall vs plain PQ stays useful
    val probed = Pq.ivfPqSearch(both, cents, model, Q64, k, nprobe = 3, refine = 100)
      .collect().map(_.getLong(0)).toSet
    val recall = (probed intersect plainPq.toSet).size.toDouble / k
    assert(recall >= 0.5, s"ivfpq recall vs pq $recall")
  }

  test("training clamps the codebook to the sample size; empty store is a clear error") {
    import spark.implicits._
    val tiny = (0L until 5L).map(i => (i, Array.fill(8)(i.toFloat / 10f), 0))
      .toDF("vec_id", "embedding", "label")
    val m = Pq.train(tiny, dim = 8, m = 2, ksub = 16) // only 5 sample vectors
    assert(m.ksub == 5 && m.codebooks.forall(_.length == 5))
    // encode + search still work end-to-end on the clamped model
    val out = Pq.search(Pq.encode(tiny, m), m,
      Array.fill(8)(0.0), k = 2, refine = 5).collect()
    assert(out.length == 2)
    intercept[IllegalArgumentException] {
      Pq.train(tiny.filter(col("vec_id") < 0), dim = 8, m = 2)
    }
  }

  test("adc approximates true distance (rank correlation sanity)") {
    // The ADC distance of a vector to ITSELF-as-codes is the quantization
    // error — must be far below the distance to a far-away query.
    val lutSelf = Pq.adcTable(
      emb.filter(col("vec_id") === 0).head().getSeq[Float](1).map(_.toDouble).toArray, model)
    val selfAdc = encoded.filter(col("vec_id") === 0)
      .select(Pq.adcDist(col("pq_codes"), lutSelf)).head().getDouble(0)
    val farAdc = encoded.filter(col("vec_id") === 1)
      .select(Pq.adcDist(col("pq_codes"), lutSelf)).head().getDouble(0)
    assert(selfAdc < farAdc)
  }
}
