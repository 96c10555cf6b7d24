package graft

import graft.core.{Fixtures, Tables}
import graft.functions.Distances
import graft.operators.{Ann, Knn}
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpecBase {
  import Fixtures._

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("IVF: full probe (nprobe = nCentroids) is exact") {
    val cents = Ann.sampleCentroids(emb, 8)
    val assigned = Ann.assign(emb, cents).cache()
    val ivf = Ann.search(assigned, cents, Q64, 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val brute = Knn.bruteForce(emb, Distances.squaredL2Lit(col("embedding"), Q64), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivf.toSeq === brute.toSeq)
  }

  test("IVF: partial probe achieves reasonable recall@10") {
    val cents = Ann.sampleCentroids(emb, 16)
    val assigned = Ann.assign(emb, cents).cache()
    val ivf = Ann.search(assigned, cents, Q64, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    val brute = Knn.bruteForce(emb, Distances.squaredL2Lit(col("embedding"), Q64), 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (ivf & brute).size / 10.0
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("IVF cell assignment covers all rows exactly once") {
    val cents = Ann.sampleCentroids(emb, 8)
    val assigned = Ann.assign(emb, cents)
    assert(assigned.count() === emb.count())
    val cells = assigned.select("ivf_cell").distinct().collect().map(_.getInt(0))
    assert(cells.forall(c => c >= 0 && c < 8))
  }

  test("LSH: identical vectors always collide; near-dup pairs verified by cosine") {
    val dup = emb.limit(5)
      .unionByName(emb.limit(5).withColumn("vec_id", col("vec_id") + 10000L))
    val pairs = Ann.lshNearDupPairs(dup, Planes16, Dim, 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // each of the 5 originals pairs with its copy
    assert(pairs.length >= 5)
    (0 until 5).foreach { i =>
      assert(pairs.contains((i.toLong, i + 10000L)))
    }
  }

  test("multi-probe widens the candidate set over single-bucket LSH") {
    val planes8 = Planes16.take(8)
    val qSig = Ann.querySignature(planes8, Q64)
    val single = emb
      .withColumn("sig", Ann.lshSignature(col("embedding"), planes8))
      .filter(col("sig") === qSig).count()
    val probes = Ann.multiProbeSigs(planes8, Q64)
    val multi = emb
      .withColumn("sig", Ann.lshSignature(col("embedding"), planes8))
      .filter(col("sig").isin(probes: _*)).count()
    assert(multi >= single)
    assert(multi > 0, "no candidates in any probed bucket")
    // top-k from the probed buckets: every result must come from them and
    // be ranked by exact squared L2 (ascending, id tie-break)
    val got = Ann.lshMultiProbeTopK(emb, planes8, Q64, 10).collect()
    assert(got.nonEmpty && got.length <= 10)
    val dists = got.map(_.getDouble(2)).toSeq
    assert(dists == dists.sorted)
  }

  test("LSH signature is deterministic and bucket join never cross-joins different sigs") {
    val sigA = emb.select(Ann.lshSignature(col("embedding"), Planes16)).collect().map(_.getLong(0))
    val sigB = emb.select(Ann.lshSignature(col("embedding"), Planes16)).collect().map(_.getLong(0))
    assert(sigA.sameElements(sigB))
  }

  test("incremental admission == full rebuild under frozen centroids; report flags hot cells") {
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val cents = Ann.sampleCentroids(base, 8)
    val assignedBase = Ann.assign(base, cents)
    val admitted = Ann.admitBatch(assignedBase, batch, cents)
    // admission is exactly a rebuild with the same frozen centroids
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("ivf_cell").cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(admitted) == cells(Ann.assign(emb, cents)))
    // report accounting: n_after - n_before == batch assignment; totals add up
    val rep = Ann.admissionReport(assignedBase, admitted, nCells = 8, maxLoad = 2.0)
      .collect()
    assert(rep.length == 8)
    assert(rep.map(_.getLong(2)).sum == emb.count())
    assert(rep.map(_.getLong(3)).sum == batch.count())
    val total = rep.map(_.getLong(2)).sum
    rep.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) == r.getLong(3))
      val flagged = r.getInt(5) == 1
      val over = r.getLong(2) * 8.0 > total * 2.0 // the unrounded rule
      assert(flagged == over, s"cell ${r.getInt(0)}: flag=$flagged lf=${r.getDouble(4)}")
    }
    // a deliberately skewed admission trips the retrain flag: assign the
    // whole batch to cell 0 by training a one-cell codebook for it
    val skewed = assignedBase.unionByName(
      batch.withColumn("ivf_cell", lit(0)).select(assignedBase.columns.map(col): _*))
    val rep2 = Ann.admissionReport(assignedBase, skewed, nCells = 8, maxLoad = 2.0)
      .collect()
    assert(rep2.exists(_.getInt(5) == 1), "skewed load must raise the retrain flag")
  }

  test("admissionReportDelta(before, batch) == admissionReport(before, before ∪ batch) (r17)") {
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    val cents = Ann.sampleCentroids(base, 8)
    val assignedBase = Ann.assign(base, cents)
    val assignedBatch = Ann.assign(batch, cents)
    val full = Ann.admissionReport(assignedBase,
        Ann.admitBatch(assignedBase, batch, cents), nCells = 8, maxLoad = 2.0)
      .collect().map(_.toSeq).toSeq
    val delta = Ann.admissionReportDelta(assignedBase, assignedBatch,
        nCells = 8, maxLoad = 2.0)
      .collect().map(_.toSeq).toSeq
    assert(delta == full)
  }

  test("admissionReport fails loudly on out-of-range cells and an empty after store") {
    val base = emb.limit(20)
    val cents = Ann.sampleCentroids(base, 4)
    val assigned = Ann.assign(base, cents)
    // nCells smaller than the real codebook -> cells out of [0, nCells)
    // must abort, not silently vanish from the report (r14 ADVICE)
    val eTrunc = intercept[Exception] {
      Ann.admissionReport(assigned, assigned, nCells = 2, maxLoad = 2.0).collect()
    }
    assert(eTrunc.getMessage.contains("out of range") ||
      Option(eTrunc.getCause).exists(_.getMessage.contains("out of range")))
    // empty 'after' store -> NULL total must abort, not emit NULL load rows
    val empty = assigned.filter(lit(false))
    val eEmpty = intercept[Exception] {
      Ann.admissionReport(empty, empty, nCells = 4, maxLoad = 2.0).collect()
    }
    assert(eEmpty.getMessage.contains("empty 'after' store") ||
      Option(eEmpty.getCause).exists(_.getMessage.contains("empty 'after' store")))
  }
}
