package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leave-one-out 1-NN classification over the embedding table — the
  * evaluation harness a labeled vector corpus runs to sanity-check its
  * embedding space (batch form of the reference's single kNN query,
  * vectordb/kd_tree_database.py:285-304, with the self-match excluded).
  *
  * Shape: the query slice is broadcast against the full table (queries ≪
  * corpus by construction — an evaluation sample), per-pair codegen'd
  * squared-L2, then per-query argmin via `row_number` over
  * `(dist ASC, id ASC)` — the same deterministic total order every kNN
  * operator here uses. The only shuffle is the window's partition-by-query
  * over |queries| × |db| pairs; at scale, swap the cross join for the
  * cell-pruned candidate join (KnnCellJoin) at the same contract.
  */
object KnnClassify {

  /** Shared kernel: for each query row of `db` (vec_id % queryMod == 0),
    * the single nearest `db` row satisfying `candPred` — columns
    * (qid, qlabel, vid, plabel, dist). `candPred` sits BELOW the rank, so
    * the survivor is the nearest row passing the predicate (the engine's
    * filter-before-k contract). */
  def nearestWithPredicate(db: DataFrame, dim: Int, queryMod: Long,
      candPred: org.apache.spark.sql.Column): DataFrame = {
    val q = db.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val pairs = db.crossJoin(broadcast(q))
      .filter(candPred)
      .select(col("qid"), col("qlabel"), col("label").as("plabel"),
        col("vec_id").as("vid"),
        Distances.squaredL2Cols(col("qe"), col("embedding"), dim).as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vid").asc)
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Per-label (n, n_correct) of 1-NN leave-one-out prediction, evaluating
    * the rows with `vec_id % queryMod == 0` against the whole of `db`. */
  def looAccuracy(db: DataFrame, dim: Int, queryMod: Long = 20L): DataFrame =
    nearestWithPredicate(db, dim, queryMod, col("vec_id") =!= col("qid"))
      .groupBy(col("qlabel").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("plabel") === col("qlabel"), 1L).otherwise(0L)).as("n_correct"))

  /** Hard-negative mining: each query's nearest DIFFERENT-label neighbor
    * (contrastive-training pair source) — same kernel, label predicate. */
  def hardNegatives(db: DataFrame, dim: Int, queryMod: Long = 20L): DataFrame =
    nearestWithPredicate(db, dim, queryMod, col("label") =!= col("qlabel"))
      .select(col("qid"), col("vid").as("hard_negative_id"),
        col("plabel").as("neg_label"), col("dist"))
}
