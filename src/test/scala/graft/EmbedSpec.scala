package graft

import graft.functions.Distances
import graft.index.{Grid, GridConfig}
import graft.operators.{Embed, Knn}
import org.apache.spark.sql.functions._

/** Feature-hashing embedder + composition with the vector engine: the
  * "batch embedding + index build" path end-to-end. */
class EmbedSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("sparse and dense forms agree; identical docs embed identically") {
    val dim = 32
    val sample = docs.limit(50)
    val sparse = Embed.featureHashSparse(sample, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dense = Embed.featureHashDense(sample, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    dense.foreach { case (id, vec) =>
      assert(vec.length == dim)
      vec.zipWithIndex.foreach { case (v, i) =>
        assert(v.toLong == sparse.getOrElse((id, i.toLong), 0L), s"doc $id dim $i")
      }
    }
    // same text -> same embedding
    val dup = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val dv = Embed.featureHashDense(dup, dim).collect().map(_.getSeq[Float](1))
    assert(dv(0) == dv(1))
  }

  test("dense form emits a zero vector for null-text docs instead of dropping the row") {
    val dim = 8
    val in = Seq((1L, "alpha beta"), (2L, null.asInstanceOf[String]), (3L, "gamma"))
      .toDF("doc_id", "text")
    val dense = Embed.featureHashDense(in, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(dense.keySet == Set(1L, 2L, 3L)) // pre-fix: doc 2 vanished (ADVICE r1)
    assert(dense(2L).forall(_ == 0f) && dense(2L).length == dim)
    assert(dense(1L).exists(_ != 0f))
  }

  test("embed -> index -> kNN: a duplicated document is its own nearest neighbor at dist 0") {
    val dim = 16
    val corpus = docs.limit(30).unionByName(
      docs.filter(col("doc_id") === 0).withColumn("doc_id", lit(9999L)))
    val emb = Embed.featureHashDense(corpus, dim)
      .withColumnRenamed("doc_id", "vec_id").withColumn("label", lit(0))
    val q = emb.filter(col("vec_id") === 9999L)
      .head().getSeq[Float](1).map(_.toDouble).toArray
    val top2 = Knn.bruteForce(emb, Distances.squaredL2Lit(col("embedding"), q), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(top2.map(_._1).toSet == Set(0L, 9999L), s"got ${top2.toSeq}")
    assert(top2.forall(_._2 == 0.0))
  }
}
