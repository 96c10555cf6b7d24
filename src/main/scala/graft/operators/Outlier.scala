package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distance-based outlier scoring over an embedding corpus: a point's
  * score is its distance to its k-th nearest neighbor (Ramaswamy et al.,
  * "Efficient Algorithms for Mining Outliers from Large Data Sets",
  * SIGMOD 2000). The training-data reading: embeddings far from all
  * neighbors are mislabeled/noise/OOD rows a curation pipeline drops or
  * down-weights before training.
  *
  * Built on the same broadcast-pairs + per-query top-k kernel as
  * [[KnnJoin]] (the batch form of the reference's flagship query,
  * vectordb/kd_tree_database.py:285-304) with the self-pair excluded —
  * a point is never its own neighbor. The k-th distance is emitted as
  * `MAX(dist) over the k nearest` (order-independent, so engine-exact
  * with no rounding), not `the row at rank k`.
  *
  * Scale shape: the scored subset broadcasts (score a sample, or shard the
  * full corpus into query batches); the corpus side never shuffles — the
  * only shuffle is the window's partition-by-query over the candidate
  * pairs. At 100 TB, cut candidates with the cell-pruned join
  * ([[KnnCellJoin]]) instead of the cross product; the scoring contract
  * (k-th-NN distance, self excluded) is unchanged.
  */
object Outlier {

  /** (vec_id, kth_dist, is_outlier) for every row of `queries`: squared-L2
    * distance to the k-th nearest OTHER row of `db`, flagged when above
    * `threshold`. Requires `db` to hold at least k+1 rows. */
  def kthNnDistance(db: DataFrame, queries: DataFrame, k: Int, dim: Int,
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val qs = queries.select(
      col(idCol).as("__query_id"), col(vecCol).as("__q_vec"))
    val pairs = db
      .crossJoin(broadcast(qs))
      .filter(col(idCol) =!= col("__query_id"))
      .withColumn("__dist",
        Distances.squaredL2Cols(col("__q_vec"), col(vecCol), dim))
    val w = Window.partitionBy(col("__query_id"))
      .orderBy(col("__dist").asc, col(idCol).asc)
    pairs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .groupBy(col("__query_id").as(idCol))
      .agg(max(col("__dist")).as("kth_dist"))
      .withColumn("is_outlier", (col("kth_dist") > threshold).cast("int"))
  }
}
