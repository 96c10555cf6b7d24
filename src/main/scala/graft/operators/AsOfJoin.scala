package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — a whole-operator extension the reference
  * lacks (SURVEY.md §2.2 joins row): for each left row, attach the most
  * recent right row with the same key whose event time is at or before the
  * left row's time.
  *
  * Scale design: NOT a range/theta join (which Spark would execute as a
  * key-equality join followed by a per-key filter+rank, quadratic in rows
  * per key) but a single union + window pass — tag both sides, sort within
  * each key by (time, side, tiebreak), and carry the right payload forward
  * with `last(_, ignoreNulls = true)`. One shuffle on the key, O(n log n)
  * per partition, no intermediate blow-up — survives 100 TB with AQE
  * handling key skew. The payload travels as ONE struct column so every
  * attached field comes from the same right row. Ties at the same
  * timestamp resolve right-before-left (a right row at exactly t is
  * visible) and among right rows by ascending `tiebreakR`, so the last in
  * window order (max tiebreak) wins — deterministic for oracle parity.
  */
object AsOfJoin {

  /** @param payloadR right columns to attach (must not collide with left names)
    * @param tiebreakR right column ordering rows that share (key, time);
    *                  the max-tiebreak row wins. Required for determinism.
    */
  def asOf(left: DataFrame, right: DataFrame,
           keyL: String, keyR: String,
           timeL: String, timeR: String,
           payloadR: Seq[String], tiebreakR: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = StructType(payloadR.map(c => right.schema(c)))
    val l = left
      .withColumn("__key", col(keyL)).withColumn("__t", col(timeL))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast(right.schema(tiebreakR).dataType))
      .withColumn("__r", lit(null).cast(payloadType))
    val r = right
      .withColumn("__key", col(keyR)).withColumn("__t", col(timeR))
      .withColumn("__side", lit(0))
      .withColumn("__tb", col(tiebreakR))
      .withColumn("__r", struct(payloadR.map(col): _*))
      .select((Seq("__key", "__t", "__side", "__tb", "__r").map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = false)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadR.map(c => col(s"__asof.$c").as(c)): _*)
  }
}
