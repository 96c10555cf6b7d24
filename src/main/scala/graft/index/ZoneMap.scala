package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone-map (min/max statistics) data skipping — the relational sibling of
  * the Grid cell index (reference prunes grid cells by plane-distance
  * bounds, vectordb/kd_tree_database.py:164-181; a columnar store prunes
  * files/row-groups by value bounds).
  *
  * The engine's store writes data bucketed by an opaque layout key (ingest
  * month, file id, cell id — anything); `stats` derives the per-bucket
  * [min, max] of a filter column, and `pruneScan` answers a range predicate
  * by consulting ONLY the (tiny) stats table on the driver and scanning the
  * overlapping buckets. At 100 TB the stats table is per-file footer
  * metadata (thousands of rows, not data-scale) and the bucket list becomes
  * partition/file pruning on the scan — the driver-side decision mirrors
  * `Knn.prunedSearchDf`'s candidate-cell choice. Skipping is only effective
  * when the layout key correlates with the filter column (clustered/sorted
  * layout); correctness never depends on it.
  */
object ZoneMap {

  /** Per-bucket min/max of `valueCol` — one map-side-combinable aggregation
    * over the store, persisted alongside it in a real deployment. */
  def stats(df: DataFrame, bucketCol: Column, valueCol: Column): DataFrame =
    df.groupBy(bucketCol.as("bucket"))
      .agg(min(valueCol).as("mn"), max(valueCol).as("mx"))

  /** Incremental maintenance: fold an append batch's stats into the
    * existing table WITHOUT rescanning the store — min/max re-aggregate
    * losslessly (the same partial-merge contract as
    * `agg_partial_merge_monthly`), so `mergeStats(stats(a), stats(b)) ==
    * stats(a ∪ b)` (ZoneMapSpec). Deletes, which can only WIDEN a zone
    * map's usefulness gap (bounds stay conservative, skipping stays
    * correct), are handled by periodic recompute, as in real stores. */
  def mergeStats(oldStats: DataFrame, deltaStats: DataFrame): DataFrame =
    oldStats.unionByName(deltaStats)
      .groupBy(col("bucket"))
      .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Buckets whose [mn, mx] overlaps [lo, hi) — the skip decision. The
    * stats table is bounded (one row per bucket/file), so collecting it is
    * the planner reading footer metadata, not a data-scale collect. A NULL
    * bucket (rows whose layout key is null) forms its own stats group and
    * can qualify like any other. */
  def candidateBuckets(statsDf: DataFrame, lo: Column, hi: Column): Array[Any] =
    statsDf.filter(col("mx") >= lo && col("mn") < hi)
      .select(col("bucket")).collect().map(_.get(0))

  /** Range scan via zone-map skipping: scan only overlapping buckets, then
    * apply the exact predicate. Semantically identical to
    * `df.filter(lo <= valueCol < hi)` for ANY bucketing (proven in
    * ZoneMapSpec, including a NULL layout key); faster whenever the layout
    * clusters `valueCol`. `isin` treats NULL as never-matching, so the
    * null bucket gets its own explicit isNull branch when it qualifies. */
  def pruneScan(df: DataFrame, bucketCol: Column, valueCol: Column,
      lo: Column, hi: Column): (DataFrame, Int) = {
    val cand = candidateBuckets(stats(df, bucketCol, valueCol), lo, hi)
    val (nullCand, nonNull) = cand.partition(_ == null)
    val inBuckets =
      if (nullCand.nonEmpty) bucketCol.isin(nonNull.toSeq: _*) || bucketCol.isNull
      else bucketCol.isin(nonNull.toSeq: _*)
    val pruned = df.filter(inBuckets && valueCol >= lo && valueCol < hi)
    (pruned, cand.length)
  }
}
