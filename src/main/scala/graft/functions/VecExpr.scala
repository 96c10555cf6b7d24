package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for vector distances: a tight codegen'd loop
  * over a float array instead of a 64-term unrolled expression tree.
  *
  * Metric semantics mirror the reference exactly (reference:
  * vectordb/distance_metric.py): SqL2 is SQUARED L2, no sqrt (:57-60); L1
  * (:107-112); LInf/Chebyshev (:95-104); Maha takes the reciprocal diagonal
  * (:71-74); MahaFull is d'·Sinv·d with the inverse factorized once
  * driver-side instead of the reference's per-pair np.linalg.solve (:78-80).
  *
  * Why: the unrolled Column form (Distances.*Lit) builds dim×terms
  * expression nodes — for LSH signatures that is 16 planes × 64 dims ≈ 1k
  * nodes per row, which bloats the generated method past JIT-friendly size
  * and dominates planning time. The loop form generates O(1) code per
  * metric and stays inside whole-stage codegen.
  *
  * Parity: accumulation is strictly left-to-right over dimensions, float
  * elements widened to double before arithmetic — bit-identical to both
  * the unrolled Column form and the DuckDB oracle SQL emitted by
  * `graft.oracle.DuckSql` (same association, same casts).
  *
  * Null semantics: null array, short array, or any null element → null
  * result (the unrolled form propagates element nulls the same way).
  */
object VecMetric {
  val SqL2 = "sql2"; val L1 = "l1"; val LInf = "linf"
  val Maha = "maha"; val Dot = "dot"; val Cosine = "cosine"
  /** Full-covariance Mahalanobis: w is the ROW-MAJOR FLATTENED inverse
    * covariance (n²); d' Sinv d accumulated i-outer, j-inner. */
  val MahaFull = "mahafull"

  private[functions] def checkArrayOfFloat(dt: DataType, side: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$side must be ARRAY<FLOAT>, got ${other.catalogString}")
    }

  /** Shared inner-loop body (Java source) for a metric over precomputed
    * `double d = v_i - w_i` style terms. `va`/`vb` are element accessors. */
  private[functions] def loopBody(metric: String, s1: String, s2: String,
      va: String, vb: String, wRef: String): String = metric match {
    case SqL2   => s"double d = $va - $vb; $s1 += d * d;"
    case L1     => s"$s1 += Math.abs($va - $vb);"
    case LInf   => s"$s1 = Math.max($s1, Math.abs($va - $vb));"
    case Maha   => s"double d = $va - $vb; $s1 += d * d * $wRef;"
    case Dot    => s"$s1 += $va * $vb;"
    case Cosine => s"$s1 += $va * $vb; $s2 += $va * $va;"
    case other  => throw new IllegalArgumentException(s"unknown metric $other")
  }
}

/** dist(vector column, literal query vector). For Cosine, `aux` is the
  * precomputed query norm ||q|| (driver-side, once). For Maha, `w` is the
  * reciprocal covariance diagonal. */
case class VecMetricLit(child: Expression, metric: String, q: Array[Double],
    w: Array[Double] = null) extends UnaryExpression {

  private val n = q.length
  private lazy val qNorm = math.sqrt(q.map(x => x * x).sum)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VecMetric.checkArrayOfFloat(child.dataType, "vector")
  override protected def withNewChildInternal(newChild: Expression): VecMetricLit =
    copy(child = newChild)
  override def prettyName: String = s"vec_${metric}_lit"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < n) return null
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    import VecMetric._
    metric match {
      case SqL2 =>
        var s = 0.0; i = 0
        while (i < n) { val d = arr.getFloat(i).toDouble - q(i); s += d * d; i += 1 }; s
      case L1 =>
        var s = 0.0; i = 0
        while (i < n) { s += math.abs(arr.getFloat(i).toDouble - q(i)); i += 1 }; s
      case LInf =>
        var m = 0.0; i = 0
        while (i < n) { m = math.max(m, math.abs(arr.getFloat(i).toDouble - q(i))); i += 1 }; m
      case Maha =>
        var s = 0.0; i = 0
        while (i < n) { val d = arr.getFloat(i).toDouble - q(i); s += d * d * w(i); i += 1 }; s
      case Dot =>
        var s = 0.0; i = 0
        while (i < n) { s += arr.getFloat(i).toDouble * q(i); i += 1 }; s
      case Cosine =>
        var dot = 0.0; var vn = 0.0; i = 0
        while (i < n) {
          val v = arr.getFloat(i).toDouble
          dot += v * q(i); vn += v * v; i += 1
        }
        dot / (math.sqrt(vn) * qNorm)
      case MahaFull =>
        val d = new Array[Double](n)
        i = 0
        while (i < n) { d(i) = arr.getFloat(i).toDouble - q(i); i += 1 }
        var s = 0.0; i = 0
        while (i < n) {
          var j = 0
          while (j < n) { s += d(i) * w(i * n + j) * d(j); j += 1 }
          i += 1
        }
        s
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("qvec", q, "double[]")
    val wRef = if (w != null) ctx.addReferenceObj("wvec", w, "double[]") else "null"
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val s1 = ctx.freshName("s1")
      val s2 = ctx.freshName("s2")
      val ok = ctx.freshName("ok")
      val va = s"((double) $arr.getFloat($i))"
      val compute = metric match {
        case VecMetric.MahaFull =>
          val dArr = ctx.freshName("dArr")
          val j = ctx.freshName("j")
          s"""double[] $dArr = new double[$n];
             |for (int $i = 0; $i < $n; $i++) { $dArr[$i] = $va - $qRef[$i]; }
             |double $s1 = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  for (int $j = 0; $j < $n; $j++) {
             |    $s1 += $dArr[$i] * $wRef[$i * $n + $j] * $dArr[$j];
             |  }
             |}
             |${ev.value} = $s1;""".stripMargin
        case m =>
          val body = VecMetric.loopBody(m, s1, s2, va, s"$qRef[$i]", s"$wRef[$i]")
          val finish = m match {
            case VecMetric.Cosine =>
              // Bit-exact and always-valid Java: a decimal literal would be
              // invalid source for NaN/Infinity qNorm (Janino compile fail →
              // silent codegen fallback).
              val qnBits = java.lang.Double.doubleToRawLongBits(qNorm)
              s"${ev.value} = $s1 / (Math.sqrt($s2) * Double.longBitsToDouble(${qnBits}L));"
            case _ => s"${ev.value} = $s1;"
          }
          s"""double $s1 = 0.0;
             |double $s2 = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $body
             |}
             |$finish""".stripMargin
      }
      s"""
         |boolean $ok = $arr.numElements() >= $n;
         |if ($ok) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($arr.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  $compute
         |}
       """.stripMargin
    })
  }
}

/** argmin over a broadcast centroid table: index j minimizing squared L2
  * (first minimum wins ties — same as struct-ordering array_min on
  * (dist, idx)). One codegen'd k×dim loop per row; the struct-array
  * formulation it replaces fell out of codegen and evaluated interpreted —
  * 100× slower at 1M rows (found by ScaleProbe). */
case class VecArgMinL2(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  private val k = centroids.length
  private val dim = if (k > 0) centroids(0).length else 0

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VecMetric.checkArrayOfFloat(child.dataType, "vector")
  override protected def withNewChildInternal(newChild: Expression): VecArgMinL2 =
    copy(child = newChild)
  override def prettyName: String = "vec_argmin_l2"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return null; i += 1 }
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var s = 0.0
      i = 0
      while (i < dim) { val d = arr.getFloat(i).toDouble - c(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = j }
      j += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD"); val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $arr.numElements() >= $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($arr.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double d = ((double) $arr.getFloat($i)) - $cRef[$j][$i];
         |      $s += d * d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $j; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }
}

/** The minimum squared-L2 DISTANCE to any centroid — [[VecArgMinL2]]'s
  * value twin (that one returns the winner's index; quantization-error
  * reporting needs the winning distance itself). Identical k×dim loop and
  * accumulation order, so the value equals `least()` over the unrolled
  * per-centroid sums bit-for-bit — but as ONE compact generated loop
  * instead of a k×dim-term expression tree, whose janino compile time
  * (not row throughput) dominated the unrolled form at k×dim ≳ 2000. */
case class VecMinDistL2(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  private val k = centroids.length
  private val dim = if (k > 0) centroids(0).length else 0

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VecMetric.checkArrayOfFloat(child.dataType, "vector")
  override protected def withNewChildInternal(newChild: Expression): VecMinDistL2 =
    copy(child = newChild)
  override def prettyName: String = "vec_mindist_l2"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return null; i += 1 }
    var bestD = Double.MaxValue
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var s = 0.0
      i = 0
      while (i < dim) { val d = arr.getFloat(i).toDouble - c(i); s += d * d; i += 1 }
      if (s < bestD) bestD = s
      j += 1
    }
    bestD
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val bestD = ctx.freshName("bestD")
      val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $arr.numElements() >= $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($arr.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double d = ((double) $arr.getFloat($i)) - $cRef[$j][$i];
         |      $s += d * d;
         |    }
         |    if ($s < $bestD) { $bestD = $s; }
         |  }
         |  ${ev.value} = $bestD;
         |}
       """.stripMargin
    })
  }
}

/** The `n` nearest centroid indexes by squared L2, ascending (ties by
  * lower index) — the multi-probe companion of [[VecArgMinL2]] for batch
  * IVF: each query row probes its `nprobe` best cells. Codegen'd k×dim
  * loop with an insertion-sorted n-slot buffer (n is small). */
case class VecArgTopNL2(child: Expression, centroids: Array[Array[Double]], n: Int)
    extends UnaryExpression {

  private val k = centroids.length
  private val dim = if (k > 0) centroids(0).length else 0
  private val nn = math.min(n, k)

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VecMetric.checkArrayOfFloat(child.dataType, "vector")
  override protected def withNewChildInternal(newChild: Expression): VecArgTopNL2 =
    copy(child = newChild)
  override def prettyName: String = "vec_argtopn_l2"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return null; i += 1 }
    val bestD = Array.fill(nn)(Double.MaxValue)
    val bestI = Array.fill(nn)(-1)
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var s = 0.0
      i = 0
      while (i < dim) { val d = arr.getFloat(i).toDouble - c(i); s += d * d; i += 1 }
      if (s < bestD(nn - 1)) {
        var p = nn - 1
        while (p > 0 && bestD(p - 1) > s) {
          bestD(p) = bestD(p - 1); bestI(p) = bestI(p - 1); p -= 1
        }
        bestD(p) = s; bestI(p) = j
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bestI.filter(_ >= 0))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val p = ctx.freshName("p")
      val s = ctx.freshName("s"); val bd = ctx.freshName("bd"); val bi = ctx.freshName("bi")
      val ok = ctx.freshName("ok"); val cnt = ctx.freshName("cnt"); val out = ctx.freshName("out")
      s"""
         |boolean $ok = $arr.numElements() >= $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($arr.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $bd = new double[$nn];
         |  int[] $bi = new int[$nn];
         |  java.util.Arrays.fill($bd, Double.MAX_VALUE);
         |  java.util.Arrays.fill($bi, -1);
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double d = ((double) $arr.getFloat($i)) - $cRef[$j][$i];
         |      $s += d * d;
         |    }
         |    if ($s < $bd[$nn - 1]) {
         |      int $p = $nn - 1;
         |      while ($p > 0 && $bd[$p - 1] > $s) {
         |        $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |      }
         |      $bd[$p] = $s; $bi[$p] = $j;
         |    }
         |  }
         |  int $cnt = 0;
         |  for (int $p = 0; $p < $nn; $p++) if ($bi[$p] >= 0) $cnt++;
         |  int[] $out = new int[$cnt];
         |  for (int $p = 0; $p < $cnt; $p++) $out[$p] = $bi[$p];
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })
  }
}

object VecMetricCols {
  import VecMetric._
  val supported: Set[String] = Set(SqL2, L1, LInf, Dot, Cosine)
}

/** dist(vector column, vector column) over a known dim — the kNN-join /
  * pair-verification form. */
case class VecMetricCols(left: Expression, right: Expression, metric: String,
    dim: Int) extends BinaryExpression {

  // Maha/MahaFull need a weight vector this form doesn't carry; rejecting
  // them here keeps nullSafeEval (throws) and doGenCode (would silently
  // emit d*d*0.0) from ever diverging.
  require(VecMetricCols.supported.contains(metric),
    s"VecMetricCols supports ${VecMetricCols.supported.mkString("/")}, got $metric")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecMetric.checkArrayOfFloat(left.dataType, "left vector")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecMetric.checkArrayOfFloat(right.dataType, "right vector")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecMetricCols = copy(left = newLeft, right = newRight)
  override def prettyName: String = s"vec_${metric}_cols"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() < dim || y.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    import VecMetric._
    metric match {
      case SqL2 =>
        var s = 0.0; i = 0
        while (i < dim) { val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s += d * d; i += 1 }; s
      case L1 =>
        var s = 0.0; i = 0
        while (i < dim) { s += math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble); i += 1 }; s
      case LInf =>
        var m = 0.0; i = 0
        while (i < dim) { m = math.max(m, math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble)); i += 1 }; m
      case Dot =>
        var s = 0.0; i = 0
        while (i < dim) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }; s
      case Cosine =>
        // dot / (sqrt(||a||^2) * sqrt(||b||^2)) with each sum left-to-right,
        // matching Distances.cosineSimCols / DuckSql.cosineSimCols exactly.
        var dot = 0.0; var na = 0.0; var nb = 0.0; i = 0
        while (i < dim) {
          val u = x.getFloat(i).toDouble; val v = y.getFloat(i).toDouble
          dot += u * v; na += u * u; nb += v * v; i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      case other => throw new IllegalArgumentException(s"unknown metric $other")
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (xa, ya) => {
      val i = ctx.freshName("i")
      val s1 = ctx.freshName("s1")
      val s2 = ctx.freshName("s2")
      val s3 = ctx.freshName("s3")
      val ok = ctx.freshName("ok")
      val u = s"((double) $xa.getFloat($i))"
      val v = s"((double) $ya.getFloat($i))"
      val body = metric match {
        case VecMetric.Cosine => s"double u = $u; double v = $v; $s1 += u * v; $s2 += u * u; $s3 += v * v;"
        case m => VecMetric.loopBody(m, s1, s2, u, v, "0.0")
      }
      val finish = metric match {
        case VecMetric.Cosine => s"${ev.value} = $s1 / (Math.sqrt($s2) * Math.sqrt($s3));"
        case _ => s"${ev.value} = $s1;"
      }
      s"""
         |boolean $ok = $xa.numElements() >= $dim && $ya.numElements() >= $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($xa.isNullAt($i) || $ya.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s1 = 0.0;
         |  double $s2 = 0.0;
         |  double $s3 = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $body
         |  }
         |  $finish
         |}
       """.stripMargin
    })
  }
}

/** TWO-LEVEL argmin-centroid assignment — the large-codebook scale path.
  * A flat [[VecArgMinL2]] is O(k·dim) per row; at the k ≈ n/cellSize a
  * corpus-scaled codebook wants (10⁵+ cells at 10⁹ rows), that loop
  * dominates the assignment pass. The standard fix (FAISS IVF coarse
  * quantizer shape) is hierarchical: probe the `probes` nearest of kc
  * COARSE centroids (O(kc·dim)), then argmin only over those cells' FINE
  * codebooks (O(probes·kf·dim)) — total O((kc + probes·kf)·dim) per row,
  * √k-ish instead of k.
  *
  * Output: the GLOBAL fine-cell id (offset of the coarse cell + fine
  * index). Deterministic: coarse probe order is (dist ASC, index ASC),
  * fine scan order is ascending, strict `<` keeps the first winner.
  * With probes = kc the result equals a flat argmin over the flattened
  * codebook up to tie order (pinned in TwoLevelAssignSpec on tie-free
  * data). Any `probes ≥ 1` yields a VALID partition for ball-based
  * pruning (CosineJoin/SemDeDup) — admissible bounds never require the
  * TRUE nearest cell, only a deterministic one.
  */
case class VecArgMinL2TwoLevel(child: Expression,
    coarse: Array[Array[Double]], fine: Array[Array[Array[Double]]],
    probes: Int) extends UnaryExpression {

  private val kc = coarse.length
  private val dim = if (kc > 0) coarse(0).length else 0
  private val np = math.max(1, math.min(probes, kc))
  // global id of fine cell (c, j) = offsets(c) + j
  private val offsets: Array[Int] = fine.scanLeft(0)(_ + _.length).init

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VecMetric.checkArrayOfFloat(child.dataType, "vector")
  override protected def withNewChildInternal(newChild: Expression): VecArgMinL2TwoLevel =
    copy(child = newChild)
  override def prettyName: String = "vec_argmin_l2_two_level"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return null; i += 1 }
    // nearest np coarse cells (insertion buffer, ties by lower index)
    val bd = Array.fill(np)(Double.MaxValue)
    val bi = Array.fill(np)(-1)
    var c = 0
    while (c < kc) {
      val cc = coarse(c)
      var s = 0.0; i = 0
      while (i < dim) { val d = arr.getFloat(i).toDouble - cc(i); s += d * d; i += 1 }
      if (s < bd(np - 1)) {
        var p = np - 1
        while (p > 0 && bd(p - 1) > s) { bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1 }
        bd(p) = s; bi(p) = c
      }
      c += 1
    }
    // argmin over the probed cells' fine codebooks
    var best = -1
    var bestD = Double.MaxValue
    var pi = 0
    while (pi < np) {
      val ci = bi(pi)
      if (ci >= 0) {
        val fc = fine(ci)
        var j = 0
        while (j < fc.length) {
          val f = fc(j)
          var s = 0.0; i = 0
          while (i < dim) { val d = arr.getFloat(i).toDouble - f(i); s += d * d; i += 1 }
          if (s < bestD) { bestD = s; best = offsets(ci) + j }
          j += 1
        }
      }
      pi += 1
    }
    if (best < 0) null else best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val fRef = ctx.addReferenceObj("fine", fine, "double[][][]")
    val oRef = ctx.addReferenceObj("offsets", offsets, "int[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val pi = ctx.freshName("pi"); val s = ctx.freshName("s")
      val bd = ctx.freshName("bd"); val bi = ctx.freshName("bi")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val ok = ctx.freshName("ok"); val fc = ctx.freshName("fc"); val ci = ctx.freshName("ci")
      s"""
         |boolean $ok = $arr.numElements() >= $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($arr.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $bd = new double[$np];
         |  int[] $bi = new int[$np];
         |  for (int $p = 0; $p < $np; $p++) { $bd[$p] = Double.MAX_VALUE; $bi[$p] = -1; }
         |  for (int $c = 0; $c < $kc; $c++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double d = ((double) $arr.getFloat($i)) - $cRef[$c][$i];
         |      $s += d * d;
         |    }
         |    if ($s < $bd[$np - 1]) {
         |      int $p = $np - 1;
         |      while ($p > 0 && $bd[$p - 1] > $s) {
         |        $bd[$p] = $bd[$p - 1]; $bi[$p] = $bi[$p - 1]; $p--;
         |      }
         |      $bd[$p] = $s; $bi[$p] = $c;
         |    }
         |  }
         |  int $best = -1;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $pi = 0; $pi < $np; $pi++) {
         |    int $ci = $bi[$pi];
         |    if ($ci >= 0) {
         |      double[][] $fc = $fRef[$ci];
         |      for (int $j = 0; $j < $fc.length; $j++) {
         |        double $s = 0.0;
         |        for (int $i = 0; $i < $dim; $i++) {
         |          double d = ((double) $arr.getFloat($i)) - $fc[$j][$i];
         |          $s += d * d;
         |        }
         |        if ($s < $bestD) { $bestD = $s; $best = $oRef[$ci] + $j; }
         |      }
         |    }
         |  }
         |  if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
         |}
       """.stripMargin
    })
  }
}

/** Max cosine similarity of the vector column against a SET of literal
  * query vectors — the semantic-decontamination kernel ("is this corpus
  * row ≥ τ-similar to ANY benchmark vector"). One compact k×dim loop with
  * the query norms precomputed driver-side, instead of a
  * greatest-of-k-unrolled-cosines Column tree whose janino compile time
  * grows with the benchmark set (the VecArgMinL2 lesson). Arithmetic per
  * query vector is EXACTLY cosineSimLit's: dot (i ascending, left-assoc)
  * / (sqrt(Σ v_i², i ascending) · qNorm-literal) — so the value equals
  * both the unrolled form and a DuckDB cosineSimCols MAX over a join
  * (the engine's sqrt of the identical double sum equals the
  * driver-precomputed norm). Max keeps the first-seen winner on exact
  * ties, which is immaterial for the VALUE. */
case class VecMaxCosLit(child: Expression, qs: Array[Array[Double]])
    extends UnaryExpression {

  // driver-literal budget (SCALE_NOTES): the benchmark matrix ships in the
  // plan (k×dim doubles; janino cost is CONSTANT — one fused loop — but
  // task-binary size is not). Beyond the cap, shard the benchmark set
  // into multiple passes or move to a broadcast join.
  require(qs.length <= 16384,
    s"${qs.length} benchmark vectors exceed the 16384 plan-literal budget")

  private val k = qs.length
  private val dim = if (k > 0) qs(0).length else 0
  private val qNorms: Array[Double] =
    qs.map(q => math.sqrt(q.map(x => x * x).sum))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VecMetric.checkArrayOfFloat(child.dataType, "vector")
  override protected def withNewChildInternal(newChild: Expression): VecMaxCosLit =
    copy(child = newChild)
  override def prettyName: String = "vec_max_cos_lit"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (arr.isNullAt(i)) return null; i += 1 }
    var vn = 0.0
    i = 0
    while (i < dim) { val v = arr.getFloat(i).toDouble; vn += v * v; i += 1 }
    val sv = math.sqrt(vn)
    var best = Double.NegativeInfinity
    var j = 0
    while (j < k) {
      val q = qs(j)
      var dot = 0.0
      i = 0
      while (i < dim) { dot += arr.getFloat(i).toDouble * q(i); i += 1 }
      val c = dot / (sv * qNorms(j))
      if (c > best) best = c
      j += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("qs", qs, "double[][]")
    val nRef = ctx.addReferenceObj("qn", qNorms, "double[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val vn = ctx.freshName("vn"); val sv = ctx.freshName("sv")
      val dot = ctx.freshName("dot"); val best = ctx.freshName("best")
      val c = ctx.freshName("c"); val ok = ctx.freshName("ok")
      s"""
         |boolean $ok = $arr.numElements() >= $dim;
         |if ($ok) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($arr.isNullAt($i)) { $ok = false; break; }
         |  }
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $vn = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double v = (double) $arr.getFloat($i);
         |    $vn += v * v;
         |  }
         |  double $sv = Math.sqrt($vn);
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += ((double) $arr.getFloat($i)) * $qRef[$j][$i];
         |    }
         |    double $c = $dot / ($sv * $nRef[$j]);
         |    if ($c > $best) { $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }
}
