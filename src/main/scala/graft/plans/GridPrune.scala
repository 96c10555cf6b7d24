package graft.plans

import graft.functions.{VecMetric, VecMetricLit}
import graft.index.{Grid, GridConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Automatic grid data skipping as an OPTIMIZER RULE: a radius predicate
  * `vec_sql2_lit(embedding) ≤ r` over a relation that carries the grid's
  * `cell_id` column gains the conjunct `cell_id IN (candidate cells)`,
  * where a candidate is any cell whose closed-form plane lower bound
  * (`Grid.cellLowerBoundSqL2` — the reference's `distance_to_partition`,
  * vectordb/kd_tree_database.py:164-181, evaluated per cell instead of
  * per tree node) is ≤ r. Admissible, so the rewrite only SKIPS rows the
  * exact predicate would reject anyway — the original predicate stays as
  * the re-check.
  *
  * This closes the loop the driver-side `Knn.prunedRadius` opens: there
  * the CALLER must know about the index; here any query that merely
  * *filters by distance* — `spark.sql` text included — gets the pruning,
  * and on a store written `partitionBy("cell_id")` the injected IN
  * reaches the scan as a PARTITION filter, i.e. files for far cells are
  * never opened. SURVEY §2 disposition (c): the rule composes with the
  * session's other extensions (KnnTopKPushdown, KnnJoinStrategy) in the
  * same user batch, run to fixed point — the cell_id-reference guard
  * stops the second application.
  *
  * The grid geometry cannot be inferred from the plan, so the store's
  * [[GridConfig]] is registered on the session (runtime conf, survives
  * plan re-use) by [[GridRadiusPruning.register]].
  */
object GridRadiusPruning extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.grid.pruneCfg"

  /** Register `cfg` on the session and install the rule (idempotent). */
  def register(spark: SparkSession, cfg: GridConfig): Unit = {
    spark.conf.set(ConfKey,
      s"${cfg.dim},${cfg.lower},${cfg.upper},${cfg.partsPerDim},${cfg.gridDims}")
    DatasetBridge.addOptimization(spark, this)
  }

  private def parseCfg(s: String): GridConfig = {
    val Array(d, lo, hi, p, g) = s.split(",")
    GridConfig(d.toInt, lo.toDouble, hi.toDouble, p.toInt, g.toInt)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (metric, query vector, aux weights, radius) when a conjunct is a
    * ≤/< bound on a native distance-literal expression with a closed-form
    * cell bound (sqL2 / L1 / L∞ / diagonal Mahalanobis — the reference's
    * four metrics, SURVEY §2.1 #12-#17; the Mahalanobis reciprocal
    * diagonal travels inside the expression itself). */
  private val Prunable = Set(VecMetric.SqL2, VecMetric.L1, VecMetric.LInf, VecMetric.Maha)
  private def radiusBound(p: Expression)
      : Option[(String, Array[Double], Array[Double], Double)] = p match {
    case LessThanOrEqual(VecMetricLit(_, m, q, w), Literal(r: Double, DoubleType))
        if Prunable(m) && (m != VecMetric.Maha || w != null) => Some((m, q, w, r))
    case LessThan(VecMetricLit(_, m, q, w), Literal(r: Double, DoubleType))
        if Prunable(m) && (m != VecMetric.Maha || w != null) => Some((m, q, w, r))
    case _ => None
  }

  private def cellBound(m: String, q: Array[Double], w: Array[Double],
      cell: Long, cfg: GridConfig): Double = m match {
    case VecMetric.SqL2 => Grid.cellLowerBoundSqL2(q, cell, cfg)
    case VecMetric.L1   => Grid.cellLowerBoundL1(q, cell, cfg)
    case VecMetric.LInf => Grid.cellLowerBoundLInf(q, cell, cfg)
    case VecMetric.Maha => Grid.cellLowerBoundMahalanobisDiag(q, cell, cfg, w)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val cfgStr = conf.getConfString(ConfKey, null)
    if (cfgStr == null) return plan
    // a malformed registration must degrade to "no pruning", never break
    // every query that passes through the optimizer
    val cfg = try parseCfg(cfgStr) catch { case _: Exception => return plan }
    plan.transformUp {
      case f @ Filter(cond, child) =>
        // LongType from Grid.withCellId; IntegerType when the column came
        // back through parquet PARTITION-column inference
        val cellAttr: Option[Attribute] =
          child.output.find(a => a.name == "cell_id" &&
            (a.dataType == LongType || a.dataType == IntegerType))
        val bound = conjuncts(cond).flatMap(radiusBound(_)).headOption
        // the cell_id-reference guard makes the fixed-point run terminate:
        // once the IN is injected the condition references cell_id
        // the q-dimension guard is CORRECTNESS, not hygiene: the session
        // may hold stores of several grid geometries, and a bound
        // computed against the wrong one is not admissible
        if (cellAttr.isEmpty || bound.isEmpty ||
            bound.exists(_._2.length != cfg.dim) ||
            cond.references.exists(_.name == "cell_id")) f
        else {
          val (m, q, w, r) = bound.get
          val cells = (0L until cfg.numCells)
            .filter(c => cellBound(m, q, w, c, cfg) <= r)
          if (cells.size == cfg.numCells.toInt) f // every cell qualifies
          else {
            val lits: Seq[Expression] =
              if (cellAttr.get.dataType == LongType)
                cells.map(c => Literal(c, LongType))
              else cells.map(c => Literal(c.toInt, IntegerType))
            val prune: Expression =
              if (cells.isEmpty) Literal(false) else In(cellAttr.get, lits)
            Filter(And(prune, cond), child)
          }
        }
    }
  }
}
