package graft.store

import graft.operators.Snapshot
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Versioned snapshot store with time travel — the multi-version read side
  * of the mutation algebra (reference keeps ONLY latest state,
  * vectordb/kd_tree_database.py:324-328; production data stores keep the
  * timeline). The Delta/Iceberg pattern reduced to its load-bearing core:
  *
  *   root/v=0/        full base state (parquet)
  *   root/v=N/        changelog batch N (full-width rows + is_delete), OR
  *                    a full checkpoint (manifest says which)
  *   root/_manifest   one line per version: "N full|delta" — tiny
  *                    driver-side metadata, the _delta_log analog
  *
  * Reads never list directories (object-store LIST is slow and
  * eventually-consistent); the manifest is the single source of truth.
  * `readAsOf(v)` starts from the latest FULL version <= v and folds
  * [[Snapshot.merge]] over the deltas after it — so replay depth is
  * bounded by checkpoint frequency, not store age. At 100 TB: deltas are
  * mutation batches (small), checkpoints amortize them, and the fold
  * inherits merge's shape — the state side never shuffles, each delta
  * broadcasts into one anti-join + union.
  */
object VersionedStore {

  private def manifestPath(root: String) = Paths.get(root, "_manifest")

  /** (version, isFull) entries in commit order. A malformed LAST line is a
    * torn append from a crash mid-write — that version never committed, so
    * it is dropped; a malformed line anywhere ELSE means real corruption
    * and fails loudly rather than silently skipping committed history. */
  def versions(root: String): Seq[(Int, Boolean)] = {
    val lines = Files.readAllLines(manifestPath(root)).asScala.toSeq
      .filter(_.nonEmpty)
    lines.zipWithIndex.flatMap { case (line, i) =>
      line.split(" ") match {
        case Array(v, kind) if v.nonEmpty && v.forall(_.isDigit) &&
            (kind == "full" || kind == "delta") =>
          Some((v.toInt, kind == "full"))
        case _ if i == lines.size - 1 => None
        case _ => throw new IllegalStateException(
          s"VersionedStore: corrupt manifest line '$line' in $root")
      }
    }
  }

  private def appendManifest(root: String, v: Int, full: Boolean): Unit = {
    Files.createDirectories(Paths.get(root))
    Files.writeString(manifestPath(root), s"$v ${if (full) "full" else "delta"}\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Create the store: `state` becomes full version 0. Destroys any
    * existing manifest at `root` (version dirs are overwritten lazily). */
  def init(state: DataFrame, root: String): Unit = {
    Files.createDirectories(Paths.get(root))
    Files.deleteIfExists(manifestPath(root))
    state.write.mode("overwrite").parquet(s"$root/v=0")
    appendManifest(root, 0, full = true)
  }

  /** Commit a changelog batch (full-width rows + boolean `is_delete`) as
    * the next version; returns its version number. Semantics per batch row
    * follow [[Snapshot.merge]] (upsert/delete; duplicate ids raise). */
  def commit(batch: DataFrame, root: String): Int = {
    val v = versions(root).map(_._1).max + 1
    batch.write.mode("overwrite").parquet(s"$root/v=$v")
    appendManifest(root, v, full = false)
    v
  }

  /** Materialize the current state as a full checkpoint version; later
    * reads replay only deltas committed after it. */
  def checkpoint(spark: SparkSession, root: String, idCol: String): Int = {
    val latest = versions(root).map(_._1).max
    val state = readAsOf(spark, root, latest, idCol)
    val v = latest + 1
    state.write.mode("overwrite").parquet(s"$root/v=$v")
    appendManifest(root, v, full = true)
    v
  }

  /** State as of `version` (inclusive): latest full version <= it, plus a
    * [[Snapshot.merge]] fold of the deltas in between. */
  def readAsOf(spark: SparkSession, root: String, version: Int,
      idCol: String): DataFrame = {
    val entries = versions(root).filter(_._1 <= version)
    require(entries.nonEmpty, s"no versions <= $version in $root")
    val baseV = entries.filter(_._2).map(_._1).max
    val base = spark.read.parquet(s"$root/v=$baseV")
    entries.filter { case (v, full) => !full && v > baseV }
      .map(_._1).sorted
      .foldLeft(base) { (state, v) =>
        Snapshot.merge(state, spark.read.parquet(s"$root/v=$v"), idCol)
      }
  }
}
