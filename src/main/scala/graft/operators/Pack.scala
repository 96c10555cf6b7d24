package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequence packing (north-star LLM-pipeline extension): pack
  * documents into fixed-capacity token bins — the batching step that turns
  * a curated corpus into trainer-ready context windows.
  *
  * The fold "new bin when the next doc would overflow" is inherently
  * sequential, so the distributed form packs WITHIN deterministic hash
  * groups (`doc_id % numGroups`) and lets groups proceed independently —
  * exactly how a 1000-executor packer shards: pick numGroups so a group's
  * doc stream fits one task, and packing 100 TB is one shuffle.
  *
  * Physical shape: ONE hash repartition on the group key +
  * `sortWithinPartitions(grp, id)` (shuffle-local sort, no global sort),
  * then a streaming per-partition fold that resets state at group
  * boundaries — O(1) memory per task, never materializes a group. This is
  * the one genuinely imperative per-partition loop in the codebase, which
  * is the `mapPartitions` escape hatch's intended use (SURVEY.md §7: no
  * built-in operator expresses a sequential carry across rows).
  */
object Pack {

  /** Pack docs into bins of `capacity` tokens, greedily in id order within
    * each of `numGroups` hash groups. Returns one row per doc:
    * (grp, doc_id, n_tokens, bin_idx, bin_fill) where bin_fill is the
    * bin's running fill AFTER placing the doc. Oversized docs (n_tokens >
    * capacity) occupy a bin alone rather than erroring — the caller
    * truncates or splits them downstream. */
  def greedyPack(docs: DataFrame, idCol: String, tokCol: String,
      capacity: Long, numGroups: Int): DataFrame = {
    val spark: SparkSession = docs.sparkSession
    import spark.implicits._
    require(numGroups > 0 && capacity > 0)
    val parted = docs
      .select(col(idCol).cast("long").as("id"),
        col(tokCol).cast("long").as("tok"),
        pmod(col(idCol).cast("long"), lit(numGroups.toLong)).as("grp"))
      .repartition(numGroups min 1024, col("grp"))
      .sortWithinPartitions(col("grp"), col("id"))
      .as[(Long, Long, Long)]
    parted.mapPartitions { it =>
      var curGrp = Long.MinValue
      var bin = 0L
      var fill = 0L
      it.map { case (id, tok, grp) =>
        if (grp != curGrp) { curGrp = grp; bin = 0L; fill = tok }
        else if (fill + tok > capacity) { bin += 1L; fill = tok }
        else fill += tok
        (grp, id, tok, bin, fill)
      }
    }.toDF("grp", "doc_id", "n_tokens", "bin_idx", "bin_fill")
  }
}
