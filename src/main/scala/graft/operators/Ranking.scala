package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed GLOBAL ranking — the scale-safe replacement for an
  * unpartitioned `Window.orderBy` (which moves the whole table into ONE
  * task; WindowExec even warns about it). The classic two-pass scheme
  * every external sort/rank implementation uses:
  *
  *   1. `repartitionByRange` on the sort key — partitions are globally
  *      ordered between each other (range exchange, sampled boundaries) —
  *      then `sortWithinPartitions` for the intra-partition order;
  *   2. `zipWithIndex` over THAT materialized RDD: a per-partition count
  *      job plus an offset-shifted index map job.
  *
  * This is the one operator in the engine that deliberately drops to the
  * RDD layer (SURVEY.md §7: "RDDs only for genuine per-partition
  * imperative logic"): the two passes MUST observe the same partition
  * assignment, and a DataFrame plan re-executed for each pass re-samples
  * its range boundaries with a fresh seed (the sampler is seeded from
  * the freshly-assigned RDD id), silently mis-offsetting ranks of
  * boundary-tied rows. Pinning ONE RDD fixes the boundaries once, and
  * Spark's shuffle-stage reuse means the exchange is computed once, not
  * twice. The rank OUTPUT is boundary-independent anyway — a total order
  * admits exactly one rank assignment — so re-invoking the builder is
  * deterministic even though the sampled boundaries are not.
  */
object Ranking {

  /** Attach 1-based global `row_number` under `order` (must be a TOTAL
    * order — include a unique tiebreak column) as long column `out`.
    * No stage ever holds more than one partition's rows; the only
    * corpus-scale movement is the range exchange. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val ranked = parted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked,
      StructType(df.schema.fields :+ StructField(out, LongType, nullable = false)))
  }
}
