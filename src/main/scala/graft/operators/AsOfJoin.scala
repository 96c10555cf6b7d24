package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — a whole-operator extension the reference
  * lacks (SURVEY.md §2.2 joins row): for each left row, attach the nearest
  * right row with the same key at or before ("backward", the default) or at
  * or after ("forward") the left row's event time.
  *
  * Scale design: NOT a range/theta join (which Spark would execute as a
  * key-equality join followed by a per-key filter+rank, quadratic in rows
  * per key) but a single union + window pass — tag both sides, sort within
  * each key by (time, side, tiebreak), and carry the right payload across
  * with `last`/`first(_, ignoreNulls = true)`. One shuffle on the key,
  * O(n log n) per partition, no intermediate blow-up — survives 100 TB with
  * AQE handling key skew. The payload travels as ONE struct column so every
  * attached field comes from the same right row. Ties at the same
  * timestamp resolve right-visible-to-left (a right row at exactly t
  * matches in both directions); among right rows sharing (key, time) the
  * max `tiebreakR` wins backward and the min wins forward — deterministic
  * for oracle parity.
  */
object AsOfJoin {

  /** @param payloadR  right columns to attach (must not collide with left names)
    * @param tiebreakR right column ordering rows that share (key, time).
    *                  Required for determinism.
    * @param direction "backward" (most recent right row ≤ t) or "forward"
    *                  (earliest right row ≥ t)
    */
  def asOf(left: DataFrame, right: DataFrame,
           keyL: String, keyR: String,
           timeL: String, timeR: String,
           payloadR: Seq[String], tiebreakR: String,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    // Null-time semantics: "t ≤/≥ null" matches nothing, but Spark's window
    // order is NULLS FIRST, which would park a null-time left row where it
    // sees the whole partition (and make a null-time right row visible to
    // every left). Split them out: null-time right rows never match, and
    // null-time left rows pass through with a null payload.
    val leftNullT = left.filter(col(timeL).isNull)
    val left0 = left.filter(col(timeL).isNotNull)
    val right0 = right.filter(col(timeR).isNotNull)
    // Window order puts the right rows on the visible side of the left row
    // at equal timestamps: backward → right (0) sorts before left (1) and
    // the frame looks back; forward → left (0) before right (1), frame
    // looks ahead.
    val (leftSide, rightSide) = if (backward) (1, 0) else (0, 1)
    val leftCols = left.columns.toSeq
    val payloadType = StructType(payloadR.map(c => right.schema(c)))
    val l = left0
      .withColumn("__key", col(keyL)).withColumn("__t", col(timeL))
      .withColumn("__side", lit(leftSide))
      .withColumn("__tb", lit(null).cast(right.schema(tiebreakR).dataType))
      .withColumn("__r", lit(null).cast(payloadType))
    val r = right0
      .withColumn("__key", col(keyR)).withColumn("__t", col(timeR))
      .withColumn("__side", lit(rightSide))
      .withColumn("__tb", col(tiebreakR))
      .withColumn("__r", struct(payloadR.map(col): _*))
      .select((Seq("__key", "__t", "__side", "__tb", "__r").map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val ordered = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
    val w =
      if (backward) ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carry =
      if (backward) last(col("__r"), ignoreNulls = true).over(w)
      else first(col("__r"), ignoreNulls = true).over(w)
    val matched = l.unionByName(r, allowMissingColumns = false)
      .withColumn("__asof", carry)
      .filter(col("__side") === leftSide)
      .select(leftCols.map(col) ++
        payloadR.map(c => col(s"__asof.$c").as(c)): _*)
    matched.unionByName(
      leftNullT.select(leftCols.map(col) ++
        payloadR.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*))
  }

  /** Nearest-in-time as-of join: attach the right row whose time is CLOSEST
    * to the left row's (either direction); exact-tie in |Δt| resolves to the
    * EARLIER (backward) candidate. Adds `asof_dt_s` — signed whole seconds
    * from left to the matched right row (negative = match in the past).
    *
    * Same scale shape as [[asOf]]: one union, ONE shuffle on the key; the
    * backward and forward candidates come from two window frames over the
    * same exchange (Spark re-sorts per frame order but never re-partitions).
    * Equal-timestamp right rows are visible in BOTH directions (side
    * columns order right-before-left backward and left-before-right
    * forward); among right rows sharing (key, time) the max `tiebreakR`
    * wins backward and the min wins forward, mirroring [[asOf]]. */
  def asOfNearest(left: DataFrame, right: DataFrame,
                  keyL: String, keyR: String,
                  timeL: String, timeR: String,
                  payloadR: Seq[String], tiebreakR: String): DataFrame = {
    require(!payloadR.contains("__rt"),
      "asOfNearest: payload name __rt is reserved for the carried right time")
    val leftNullT = left.filter(col(timeL).isNull)
    val left0 = left.filter(col(timeL).isNotNull)
    val right0 = right.filter(col(timeR).isNotNull)
    val leftCols = left.columns.toSeq
    // the carried struct leads with the right row's epoch seconds so the
    // distance compare never re-joins the right side
    val payloadFields = ("__rt", org.apache.spark.sql.types.LongType) +:
      payloadR.map(c => (c, right.schema(c).dataType))
    val payloadType = StructType(payloadFields.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, t) })
    val l = left0
      .withColumn("__key", col(keyL)).withColumn("__t", col(timeL))
      .withColumn("__sb", lit(1)).withColumn("__sf", lit(0))
      .withColumn("__tb", lit(null).cast(right.schema(tiebreakR).dataType))
      .withColumn("__r", lit(null).cast(payloadType))
    val r = right0
      .withColumn("__key", col(keyR)).withColumn("__t", col(timeR))
      .withColumn("__sb", lit(0)).withColumn("__sf", lit(1))
      .withColumn("__tb", col(tiebreakR))
      .withColumn("__r", struct(
        (col(timeR).cast("long").as("__rt") +: payloadR.map(col)): _*))
      .select((Seq("__key", "__t", "__sb", "__sf", "__tb", "__r").map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val wb = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__sb").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__key"))
      .orderBy(col("__t").asc, col("__sf").asc, col("__tb").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val te = col("__t").cast("long")
    val db = te - col("__b.__rt")   // ≥ 0 when backward match exists
    val df = col("__f.__rt") - te   // ≥ 0 when forward match exists
    val pickBackward = col("__b").isNotNull &&
      (col("__f").isNull || db <= df)
    val matched = l.unionByName(r, allowMissingColumns = false)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__r"), ignoreNulls = true).over(wf))
      .filter(col("__sb") === 1)
      .withColumn("__n", when(pickBackward, col("__b")).otherwise(col("__f")))
      .select(leftCols.map(col) ++
        payloadR.map(c => col(s"__n.$c").as(c)) :+
        (col("__n.__rt") - te).as("asof_dt_s"): _*)
    matched.unionByName(
      leftNullT.select(leftCols.map(col) ++
        payloadR.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(null).cast("long").as("asof_dt_s"): _*))
  }
}
