package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the stateful streaming operators
  * ([[Sessionize.streaming]], [[StreamSketch]], [[StreamCap]],
  * [[StreamSample]], and the native session_window aggregations).
  *
  * The default HDFSBackedStateStoreProvider keeps EVERY key's state on the
  * executor heap (a loaded version of the whole store per partition) — fine
  * at fixture scale, but keyed state at 100 TB (sessionization over
  * hundreds of millions of users, per-key sketches/top-k) is bounded by
  * executor memory and dies in GC long before the disk fills.
  * RocksDBStateStoreProvider is the standard production choice: state
  * lives in an embedded RocksDB on executor-local disk with a bounded
  * block cache, and changelog checkpointing uploads per-batch deltas
  * instead of full snapshots. The provider is a pure execution-engine swap
  * — results are bit-identical (RocksDbStateSpec pins default ≡ RocksDB
  * for the session, KMV-sketch, and top-k state shapes and checks the
  * provider really engaged via its rocksdb* progress metrics).
  */
object StateStores {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val ChangelogKey =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  /** Run `body` (which should START its streaming queries inside) with
    * keyed state on RocksDB; restores the previous provider after. The
    * provider is read at query START from the session conf, so queries
    * started inside the block use RocksDB for their whole lifetime. */
  def withRocksDb[T](spark: SparkSession)(body: => T): T = {
    val prevProvider = spark.conf.getOption(ProviderKey)
    val prevChangelog = spark.conf.getOption(ChangelogKey)
    spark.conf.set(ProviderKey, RocksDbProvider)
    spark.conf.set(ChangelogKey, "true")
    try body
    finally {
      def restore(key: String, prev: Option[String]): Unit = prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      restore(ProviderKey, prevProvider)
      restore(ChangelogKey, prevChangelog)
    }
  }
}
