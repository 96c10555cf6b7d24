package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-dominance) queries over two criteria: keep the rows no
  * other row beats on BOTH axes (minimize `x`, maximize `y`) — "cheapest
  * for its recency" / best price-quality frontier. A preference operator
  * classic relational surfaces lack; neither the reference nor plain SQL
  * has it natively (the SQL spelling is a quadratic NOT EXISTS — the
  * oracle form, not the plan).
  *
  * 2-D structure makes it a WINDOW, not a self-join: sort by x; a row is
  * dominated iff some strictly-cheaper row has y ≥ its own (a running max
  * over the strict-predecessor frame) or an equal-x row has strictly
  * larger y. Exact in integer axes (cents / epoch seconds).
  *
  * Scale: the plain form's unpartitioned window is a single-task sort —
  * fine to ~10⁷ survivors of upstream filters, wrong at 100 TB. The
  * banded form fixes it: per-band maxima (one tiny agg) broadcast back as
  * a strict-cheaper-band dominance prefilter that discards almost
  * everything (anything beaten by a cheaper band's best y), then the
  * exact window runs on the tiny survivor set. Both proven equal to the
  * brute NOT EXISTS in SkylineSpec.
  */
object Skyline {

  /** Exact 2-D skyline: minimize integer `xCol`, maximize integer `yCol`.
    * Returns input rows that are on the frontier (duplicates of a frontier
    * point all survive — none strictly beats another). */
  def pareto2d(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val strictCheaper = Window.orderBy(xCol)
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameX = Window.partitionBy(xCol)
    df.withColumn("__max_y_cheaper", max(yCol).over(strictCheaper))
      .withColumn("__max_y_same", max(yCol).over(sameX))
      .filter(
        (col("__max_y_cheaper").isNull || col("__max_y_cheaper") < yCol) &&
        !(col("__max_y_same") > yCol))
      .drop("__max_y_cheaper", "__max_y_same")
  }

  /** Scale form: band by `xCol DIV bandWidth`, compute per-band max y,
    * prefilter every row dominated by a STRICTLY CHEAPER band's maximum
    * (cheaper band ⟹ strictly smaller x, so max-y ≥ y is full dominance),
    * then run the exact window on the survivors. The prefilter is one
    * aggregation + a broadcast join; the exact pass sees O(bands + frontier)
    * rows instead of the table. */
  def pareto2dBanded(df: DataFrame, xCol: Column, yCol: Column,
      bandWidth: Long): DataFrame = {
    val band = (xCol / bandWidth).cast("long")
    val bandMax = df.groupBy(band.as("__band")).agg(max(yCol).as("__band_max_y"))
    // running max of band maxima over strictly cheaper bands, computed on
    // the tiny band table (|bands| rows)
    val w = Window.orderBy(col("__band")).rowsBetween(Window.unboundedPreceding, -1)
    val cheaperBandMax = bandMax
      .withColumn("__cheaper_max_y", max(col("__band_max_y")).over(w))
      .select(col("__band"), col("__cheaper_max_y"))
    val survivors = df.withColumn("__band", band)
      .join(broadcast(cheaperBandMax), Seq("__band"))
      .filter(col("__cheaper_max_y").isNull || col("__cheaper_max_y") < yCol)
      .drop("__band", "__cheaper_max_y")
    pareto2d(survivors, xCol, yCol)
  }
}
