package graft

import graft.operators.Outlier
import org.apache.spark.sql.functions._

/** kth-NN-distance outlier scoring on constructed geometry: a tight
  * cluster plus one far point — the far point's kth distance is the
  * cluster gap, every cluster member's is intra-cluster. */
class OutlierSpec extends SparkSpecBase {
  import spark.implicits._

  // 5 points near the origin (pairwise squared dists ≤ 0.08), one at
  // (10, 0): its nearest cluster member is ~100 away squared
  private val pts = Seq(
    (0L, Array(0.0f, 0.0f)),
    (1L, Array(0.1f, 0.0f)),
    (2L, Array(0.0f, 0.1f)),
    (3L, Array(0.2f, 0.0f)),
    (4L, Array(0.0f, 0.2f)),
    (9L, Array(10.0f, 0.0f)))

  test("far point scores high, cluster members low; self excluded") {
    val df = pts.toDF("vec_id", "embedding")
    val out = Outlier.kthNnDistance(df, df, k = 3, dim = 2, threshold = 1.0)
      .select("vec_id", "kth_dist", "is_outlier", "n_neighbors")
      .collect().map { r =>
        assert(r.getLong(3) == 3L, s"expected full-k scoring, got ${r.getLong(3)}")
        r.getLong(0) -> (r.getDouble(1), r.getInt(2))
      }.toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 9L))
    // the far point: 3rd nearest is a cluster point ~(10-0.2)^2 away
    assert(out(9L)._1 > 90.0 && out(9L)._2 == 1)
    // cluster members: 3rd nearest is still inside the cluster
    Seq(0L, 1L, 2L, 3L, 4L).foreach { id =>
      assert(out(id)._1 <= 0.09, s"id=$id kth=${out(id)._1}")
      assert(out(id)._2 == 0)
    }
  }

  test("kth dist is the MAX over the k nearest (k=1 equals nearest-neighbor dist)") {
    val df = pts.toDF("vec_id", "embedding")
    val k1 = Outlier.kthNnDistance(df, df, k = 1, dim = 2, threshold = 1e9)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // nearest neighbor of 0 is 1 or 2 (dist 0.01 squared = 0.1^2)
    assert(math.abs(k1(0L) - 0.01) < 1e-6)
    // scoring a subset only scores those rows, against the full db
    val sub = Outlier.kthNnDistance(df, df.filter(col("vec_id") === 9L),
      k = 1, dim = 2, threshold = 1.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sub.keySet == Set(9L))
    assert(math.abs(sub(9L) - 9.8 * 9.8) < 1e-4)
  }

  test("under-k db is detectable via n_neighbors") {
    val df = pts.toDF("vec_id", "embedding")
    // db of 3 rows, k=5: only 2 non-self neighbors exist, so kth_dist is
    // the 2nd distance (an underestimate) and n_neighbors says so
    val small = df.filter(col("vec_id") <= 2L)
    val out = Outlier.kthNnDistance(small, small, k = 5, dim = 2, threshold = 1e9)
      .select("vec_id", "n_neighbors").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet == Set(2L))
  }
}
