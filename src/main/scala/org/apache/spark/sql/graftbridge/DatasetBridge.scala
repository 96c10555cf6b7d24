package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into the `private[sql]` / classic-module Dataset constructors —
  * the supported way to wrap a custom [[LogicalPlan]] into the public
  * DataFrame API in Spark 4's interface/classic split (the same pattern
  * Spark's own connectors and delta-style extensions use). */
object DatasetBridge {

  private def classic(spark: SparkSession): org.apache.spark.sql.classic.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** DataFrame over an arbitrary logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(classic(spark), plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Idempotently add a planner strategy to a LIVE session
    * (`experimental.extraStrategies` — the stable post-build injection
    * point; at session build time prefer `SparkSessionExtensions
    * .injectPlannerStrategy`). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = classic(spark).experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }

  /** Idempotently add an optimizer rule to a LIVE session
    * (`experimental.extraOptimizations` — runs in the optimizer's
    * user-provided batch, to fixed point). */
  def addOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = classic(spark).experimental
    if (!exp.extraOptimizations.contains(r))
      exp.extraOptimizations = exp.extraOptimizations :+ r
  }
}
