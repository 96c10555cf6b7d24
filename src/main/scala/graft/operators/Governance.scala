package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-governance operators: the per-source/per-language policy layer a
  * multi-dump training-data pipeline runs AFTER scoring and dedup — caps,
  * priority resolution across sources, and cross-group score calibration.
  * The reference has no multi-tenant corpus notion (one in-memory table,
  * vectordb/database.py); these generalize its single-collection model to
  * the many-sources corpus a 100 TB crawl actually is.
  */
object Governance {

  /** Keep at most `n` rows per `key`, chosen by `ordering` (must be a
    * TOTAL order for determinism — tie-break on a unique id). The
    * Common-Crawl-style per-host/per-source cap that stops any one
    * domain from dominating the mixture.
    *
    * Scale shape: `row_number <= n` over a per-key window is planned by
    * Spark as `WindowGroupLimitExec` — each map task keeps only its local
    * top-n per key BEFORE the shuffle, so the exchange carries at most
    * n·keys·tasks rows, not the corpus. No collect, no skew trap for
    * small n.
    */
  def capPerKey(df: DataFrame, key: String, n: Int, ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
    df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= n)
      .drop("__rnk")
  }

  /** Exact-duplicate resolution across sources by PRIORITY, not first-id:
    * within each content-digest group the survivor is the row with the
    * smallest (priority, id) — "when the same document appears in the
    * curated dump and the raw crawl, keep the curated copy". Emits every
    * row with its group's digest, size, survivor flag and the id it lost
    * to — the audit columns a provenance-tracked dedup keeps.
    *
    * One shuffle on the digest; the per-group window sees only duplicate
    * group members (group size is bounded by the dup rate, not the
    * corpus).
    */
  def priorityDedup(df: DataFrame, textCol: String, idCol: String,
      priorityCol: Column): DataFrame = {
    val digest = md5(col(textCol))
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(priorityCol.asc, col(idCol).asc)
    df.withColumn("content_hash", digest)
      .withColumn("group_size", count(lit(1)).over(
        Window.partitionBy(col("content_hash"))))
      .withColumn("kept_id", first(col(idCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("is_kept", (col(idCol) === col("kept_id")).cast("int"))
  }

  /** Per-group percentile normalization of a score column — the
    * cross-language calibration step: a raw quality score is only
    * comparable WITHIN a language, so gates are set on the per-language
    * percentile, not the raw value. `pctl` is the fraction of the group's
    * rows with a STRICTLY smaller score, i.e. SQL `percent_rank()` over
    * (group, score) ties included: (rows below) / (n - 1).
    *
    * Scale shape: NOT a row-level window (a per-language sort of the
    * corpus). The caller passes an already-QUANTIZED score (`scoreQ`);
    * the corpus collapses to a per-(group, score) HISTOGRAM, the running
    * below-count runs over |group × distinct quantized score| histogram
    * rows, and the percentile joins back by (group, score) — the same
    * collapse rank_auc_classifier uses. The quantization scale is the
    * knob that bounds the histogram (4 decimals → ≤ 10^4 buckets per
    * group for a [0,1] score, broadcast-sized at any corpus size; finer
    * scales trade histogram size for resolution). The quantized score is
    * also the join key, so the mapping is exact — no double-equality
    * join hazard.
    */
  def percentileByGroup(df: DataFrame, group: String, scoreQ: Column): DataFrame = {
    val scored = df.withColumn("__q", scoreQ)
    val hist = scored.groupBy(col(group), col("__q"))
      .agg(count(lit(1)).as("__c"))
    val below = Window.partitionBy(col(group)).orderBy(col("__q").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = Window.partitionBy(col(group))
    val pr = hist
      .withColumn("__below", coalesce(sum(col("__c")).over(below), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(tot))
      .withColumn("pctl",
        when(col("__n") > 1,
          round(col("__below").cast("double") / (col("__n") - 1).cast("double"), 9))
          .otherwise(lit(0.0)))
      .select(col(group), col("__q"), col("pctl"))
    scored.join(broadcast(pr), Seq(group, "__q"))
      .withColumnRenamed("__q", "score_q")
  }
}
