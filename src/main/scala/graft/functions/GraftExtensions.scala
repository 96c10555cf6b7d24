package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType}

/** `SparkSessionExtensions` plugin that registers the vector metrics as SQL
  * functions, so `spark.sql("... vec_sql2(embedding, array(...)) ...")`
  * works alongside the Column API. Install with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")` at
  * session build time, or `GraftExtensions.install(spark)` on a live one.
  *
  * Each function takes (vector_col ARRAY<FLOAT>, query array literal) — the
  * query argument must be foldable; it is evaluated at plan time into the
  * literal array carried by [[VecMetricLit]], so SQL-authored queries get
  * the same codegen'd loop as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    // whole-operator extension point: the batch-kNN-join logical node
    // (graft.plans.KnnJoinPlan) planned to its dedicated physical operator
    ext.injectPlannerStrategy(_ => graft.plans.KnnJoinStrategy)
    // optimizer rule: Filter(rn <= m) above the node shrinks its k to m
    ext.injectOptimizerRule(_ => graft.plans.KnnTopKPushdown)
  }
}

object GraftExtensions {

  private def foldToDoubles(e: Expression, fn: String): Array[Double] = {
    require(e.foldable, s"$fn: query vector argument must be a literal/foldable array")
    val arr = e.eval().asInstanceOf[ArrayData]
    val dt = e.dataType.asInstanceOf[ArrayType].elementType
    Array.tabulate(arr.numElements()) { i =>
      dt match {
        case DoubleType => arr.getDouble(i)
        case FloatType => arr.getFloat(i).toDouble
        case IntegerType => arr.getInt(i).toDouble
        case LongType => arr.getLong(i).toDouble
        case other => throw new IllegalArgumentException(
          s"$fn: unsupported query element type $other")
      }
    }
  }

  private def entry(name: String, metric: String) = {
    val info = new ExpressionInfo(classOf[VecMetricLit].getName, name)
    val builder: Seq[Expression] => Expression = { args =>
      require(args.length == 2, s"$name(vector, query_literal) takes 2 arguments")
      VecMetricLit(args.head, metric, foldToDoubles(args(1), name))
    }
    (FunctionIdentifier(name), info, builder)
  }

  private[functions] val registrations = Seq(
    entry("vec_sql2", VecMetric.SqL2),
    entry("vec_l1", VecMetric.L1),
    entry("vec_linf", VecMetric.LInf),
    entry("vec_dot", VecMetric.Dot),
    entry("vec_cosine", VecMetric.Cosine))

  /** Register into an already-built session (tests, notebooks). */
  def install(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
