package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed table layout: both sides of a recurring equi-join are written
  * hash-bucketed (and bucket-sorted) on the join key, so the join reads
  * co-located buckets and runs with ZERO shuffle — the layout that makes a
  * fact-to-fact join survive at 100 TB, where an exchange of either side
  * is the job's dominant cost. The reference has no storage layer at all
  * (in-memory dicts, vectordb/kd_tree_database.py:251); bucketing is the
  * cluster-native analog of its grid index applied to JOIN keys instead of
  * vector coordinates.
  *
  * Spark reads the bucket spec from the catalog, so bucketed data must go
  * through `saveAsTable` (a path-only parquet write drops the metadata).
  * Tables are written as EXTERNAL at a caller-controlled path with
  * overwrite semantics — re-running a pipeline replaces the layout
  * atomically per table name.
  */
object Bucketed {

  /** Write `df` as an external parquet table hash-bucketed AND sorted by
    * `key` into `nBuckets` buckets. Idempotent per (tableName): overwrite
    * replaces data and bucket spec. Path defaults under java.io.tmpdir. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      nBuckets: Int, path: String = null): DataFrame = {
    val p = Option(path).getOrElse(
      new java.io.File(sys.props("java.io.tmpdir"), s"graft_$tableName").getPath)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", p)
      .saveAsTable(tableName)
    df.sparkSession.table(tableName)
  }
}
