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
  * overwrite semantics. NOTE: overwrite is drop-then-CTAS, NOT atomic for
  * concurrent readers — re-running a pipeline replaces the layout per
  * table name, but readers racing the rewrite can observe a missing
  * table; production layouts sequence the swap (write to a fresh path,
  * then repoint) or run it in a maintenance window.
  */
object Bucketed {

  /** Write `df` as an external parquet table hash-bucketed AND sorted by
    * `key` into `nBuckets` buckets. Idempotent per (tableName): overwrite
    * replaces data and bucket spec. The default path is scoped by the
    * Spark applicationId so two concurrent runs (parallel CI jobs,
    * ScaleProbe next to the test suite) writing the same table name land
    * in different directories instead of clobbering each other's live
    * files. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      nBuckets: Int, path: String = null): DataFrame = {
    val p = Option(path).getOrElse(defaultPath(df, tableName))
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", p)
      .saveAsTable(tableName)
    df.sparkSession.table(tableName)
  }

  /** [[writeBucketed]], memoized on catalog existence: if `tableName` is
    * already registered in this session the write is skipped and the
    * existing table returned. Keeps a query builder that needs the layout
    * a PURE plan constructor after first use — rebuilding the plan (bench
    * harnesses call builders repeatedly) must not re-pay two table
    * writes, and must not time them. */
  def writeBucketedIfAbsent(df: DataFrame, tableName: String, key: String,
      nBuckets: Int, path: String = null): DataFrame = {
    val s = df.sparkSession
    if (s.catalog.tableExists(tableName)) s.table(tableName)
    else writeBucketed(df, tableName, key, nBuckets, path)
  }

  private def defaultPath(df: DataFrame, tableName: String): String = {
    val appId = df.sparkSession.sparkContext.applicationId
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_${appId}_$tableName").getPath
  }
}
