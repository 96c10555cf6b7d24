package graft.plans

import graft.functions.{VecMetric, VecMetricLit}
import graft.index.{QuantileGrid, QuantileGridConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, Expression, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** [[GridRadiusPruning]]'s sibling for QUANTILE-calibrated geometries: a
  * radius predicate over a relation carrying a quantile grid's `cell_id`
  * gains `cell_id IN (cells whose interval lower bound ≤ r)` — same
  * admissible-rewrite contract (original predicate kept as the re-check),
  * same binding discipline, evaluated with
  * [[QuantileGrid.cellLowerBoundSqL2]]-family bounds instead of the
  * equal-width closed forms.
  *
  * Kept as a SEPARATE rule rather than widening GridRadiusPruning's
  * registry: the two geometries serialize differently (a boundary TABLE
  * vs five scalars), bind by different metadata keys (`graft.qgrid.fp` vs
  * `graft.grid.fp` — a quantile column must never receive an equal-width
  * cell list or vice versa), and the shared `cell_id`-reference guard
  * already makes the two rules compose safely in one fixed-point batch
  * (whichever binds first injects; the other then sees cell_id referenced
  * and refuses).
  *
  * Binding priority (mirrors the equal-width rule):
  *  1. `graft.qgrid.fp` column metadata matching a registered fingerprint;
  *  2. scan root path registered via `register(spark, cfg, storePath)`;
  *  3. exactly ONE registered unbound config with the query's dimension.
  */
object QuantileGridRadiusPruning extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.qgrid.pruneCfg"
  val FpMetaKey = "graft.qgrid.fp"

  def register(spark: SparkSession, cfg: QuantileGridConfig): Unit =
    addEntry(spark, cfg, None)

  def register(spark: SparkSession, cfg: QuantileGridConfig, storePath: String): Unit =
    addEntry(spark, cfg, Some(storePath))

  private def addEntry(spark: SparkSession, cfg: QuantileGridConfig,
      path: Option[String]): Unit = {
    val newPath = path.map(normPath)
    // same eviction discipline as the equal-width registry: a re-bucketed
    // store's stale (oldCfg, path) entry must not shadow the new geometry
    val kept = parseEntries(spark.conf.get(ConfKey, ""))
      .filterNot { case (c, p) =>
        c.fingerprint == cfg.fingerprint || (newPath.isDefined && p == newPath)
      }
    val all = kept :+ (cfg, newPath)
    spark.conf.set(ConfKey, all.map { case (c, p) =>
      val bs = c.boundaries.map(_.mkString(",")).mkString("|")
      val enc = java.net.URLEncoder.encode(p.getOrElse(""), "UTF-8")
      s"${c.dim}!$bs!$enc"
    }.mkString(";"))
    DatasetBridge.addOptimization(spark, this)
  }

  private def normPath(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  private def parseEntries(s: String): Seq[(QuantileGridConfig, Option[String])] =
    if (s == null || s.isEmpty) Seq.empty
    else s.split(";").toSeq.map { e =>
      val parts = e.split("!", -1)
      val boundaries = parts(1).split('|').toSeq.map(_.split(',').toSeq.map(_.toDouble))
      val cfg = QuantileGridConfig(parts(0).toInt, boundaries)
      val p = if (parts.length > 2 && parts(2).nonEmpty)
        Some(java.net.URLDecoder.decode(parts(2), "UTF-8")) else None
      (cfg, p)
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

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
      cell: Long, cfg: QuantileGridConfig): Double = m match {
    case VecMetric.SqL2 => QuantileGrid.cellLowerBoundSqL2(q, cell, cfg)
    case VecMetric.L1   => QuantileGrid.cellLowerBoundL1(q, cell, cfg)
    case VecMetric.LInf => QuantileGrid.cellLowerBoundLInf(q, cell, cfg)
    case VecMetric.Maha => QuantileGrid.cellLowerBoundMahalanobisDiag(q, cell, cfg, w)
  }

  private def scanPathOf(child: LogicalPlan, attr: Attribute): Option[String] =
    child.collectLeaves().collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.output.exists(_.exprId == attr.exprId) =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(_.toUri.getPath)
          case _ => None
        }
    }.flatten

  private def bindCfg(entries: Seq[(QuantileGridConfig, Option[String])],
      child: LogicalPlan, attr: Attribute, qDim: Int): Option[QuantileGridConfig] = {
    // symmetric refusal: an equal-width-stamped column belongs to
    // GridRadiusPruning — quantile interval bounds against equal-width
    // buckets would be inadmissible through the unbound fallback
    if (attr.metadata.contains(GridRadiusPruning.FpMetaKey)) return None
    if (attr.metadata.contains(FpMetaKey)) {
      val fp = attr.metadata.getString(FpMetaKey)
      return entries.map(_._1).find(c => c.fingerprint == fp && c.dim == qDim)
    }
    scanPathOf(child, attr).flatMap { p =>
      entries.collectFirst {
        case (c, Some(bp)) if bp == p && c.dim == qDim => c
      }
    }.orElse {
      entries.filter { case (c, p) => p.isEmpty && c.dim == qDim } match {
        case Seq((one, _)) => Some(one)
        case _ => None // zero or ambiguous — never guess a geometry
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val cfgStr = conf.getConfString(ConfKey, null)
    if (cfgStr == null || cfgStr.isEmpty) return plan
    val entries = try parseEntries(cfgStr) catch { case _: Exception => return plan }
    if (entries.isEmpty) return plan
    plan.transformUp {
      case f @ Filter(cond, child) =>
        val cellAttr: Option[Attribute] =
          child.output.find(a => a.name == "cell_id" &&
            (a.dataType == LongType || a.dataType == IntegerType))
        val bound = conjuncts(cond).flatMap(radiusBound(_)).headOption
        val cfgOpt = for {
          attr <- cellAttr
          (_, q, _, _) <- bound
          if !cond.references.exists(_.name == "cell_id")
          cfg <- bindCfg(entries, child, attr, q.length)
          // the rule enumerates every cell on the DRIVER per matching
          // Filter per optimizer pass — an unbounded registered geometry
          // would make query OPTIMIZATION itself O(numCells). Past the cap
          // the rule degrades to "no pruning" (always correct); a geometry
          // that large should partition-prune via the store layout instead
          if cfg.numCells <= GridRadiusPruning.MaxEnumCells
        } yield cfg
        if (cfgOpt.isEmpty) f
        else {
          val cfg = cfgOpt.get
          val (m, q, w, r) = bound.get
          val cells = (0L until cfg.numCells)
            .filter(c => cellBound(m, q, w, c, cfg) <= r)
          if (cells.size.toLong == cfg.numCells) f // every cell qualifies
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
