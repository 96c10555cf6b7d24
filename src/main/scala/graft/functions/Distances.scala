package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distance metrics over `ARRAY<FLOAT>` vector columns, as native Column
  * expressions (whole-stage-codegen friendly — no UDFs in the hot path).
  *
  * Semantics mirror the reference metrics
  * (reference: vectordb/distance_metric.py:57-112):
  *  - squaredL2: SQUARED Euclidean — no sqrt (distance_metric.py:59-60)
  *  - l1: Manhattan (distance_metric.py:107-112)
  *  - lInf: Chebyshev (distance_metric.py:95-104)
  *  - mahalanobisDiag: (a-b)' S^-1 (a-b) with diagonal S, passed as the
  *    reciprocal diagonal (distance_metric.py:66-82). The full-covariance
  *    variant pre-factorizes on the driver instead of re-solving per pair.
  *
  * All distances are computed in DOUBLE over float32 inputs, accumulating
  * left-to-right over dimensions — `graft.oracle.DuckSql` emits the exact
  * same association for the DuckDB oracle so results match bit-for-bit.
  *
  * Two families:
  *  - `*Lit`: vector column vs a driver-known query vector (literals are
  *    folded by Catalyst; fully unrolled → single codegen'd expression).
  *  - `*Cols`: vector column vs vector column (kNN join), unrolled over a
  *    known dim.
  */
object Distances {

  private def e(v: Column, i: Int): Column = element_at(v, i + 1).cast(DoubleType)

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  private def vmLit(v: Column, m: String, q: Array[Double], w: Array[Double] = null): Column =
    toCol(VecMetricLit(toExpr(v), m, q, w))
  private def vmCols(a: Column, b: Column, m: String, dim: Int): Column =
    toCol(VecMetricCols(toExpr(a), toExpr(b), m, dim))

  // ---- column vs literal query vector (native loop expressions; the
  // unrolled Column forms below are kept as the in-suite parity oracle) ----

  def squaredL2Lit(v: Column, q: Array[Double]): Column = vmLit(v, VecMetric.SqL2, q)

  def l1Lit(v: Column, q: Array[Double]): Column = vmLit(v, VecMetric.L1, q)

  def lInfLit(v: Column, q: Array[Double]): Column = vmLit(v, VecMetric.LInf, q)

  def mahalanobisDiagLit(v: Column, q: Array[Double], invDiag: Array[Double]): Column =
    vmLit(v, VecMetric.Maha, q, invDiag)

  def dotLit(v: Column, q: Array[Double]): Column = vmLit(v, VecMetric.Dot, q)

  /** Full-covariance Mahalanobis d' Sinv d. `invCovFlat` is the row-major
    * flattened inverse covariance, factorized ONCE on the driver (the
    * reference re-solves per pair — distance_metric.py:78-80). */
  def mahalanobisFullLit(v: Column, q: Array[Double], invCovFlat: Array[Double]): Column =
    vmLit(v, VecMetric.MahaFull, q, invCovFlat)

  /** Cosine similarity (not distance): dot / (||a|| * ||q||). */
  def cosineSimLit(v: Column, q: Array[Double]): Column = vmLit(v, VecMetric.Cosine, q)

  // ---- column vs column (pairwise / join form) ----

  def squaredL2Cols(a: Column, b: Column, dim: Int): Column =
    vmCols(a, b, VecMetric.SqL2, dim)

  def l1Cols(a: Column, b: Column, dim: Int): Column = vmCols(a, b, VecMetric.L1, dim)

  def lInfCols(a: Column, b: Column, dim: Int): Column = vmCols(a, b, VecMetric.LInf, dim)

  def dotCols(a: Column, b: Column, dim: Int): Column = vmCols(a, b, VecMetric.Dot, dim)

  def cosineSimCols(a: Column, b: Column, dim: Int): Column =
    vmCols(a, b, VecMetric.Cosine, dim)

  // ---- unrolled Column forms (reference implementation for parity tests;
  // identical IEEE association to the native expressions above) ----

  def squaredL2LitUnrolled(v: Column, q: Array[Double]): Column =
    q.indices.map { i => val d = e(v, i) - lit(q(i)); d * d }.reduce(_ + _)

  def l1LitUnrolled(v: Column, q: Array[Double]): Column =
    q.indices.map { i => abs(e(v, i) - lit(q(i))) }.reduce(_ + _)

  def lInfLitUnrolled(v: Column, q: Array[Double]): Column =
    greatest(q.indices.map { i => abs(e(v, i) - lit(q(i))) }: _*)

  def mahalanobisDiagLitUnrolled(v: Column, q: Array[Double], invDiag: Array[Double]): Column =
    q.indices.map { i => val d = e(v, i) - lit(q(i)); d * d * lit(invDiag(i)) }.reduce(_ + _)

  def cosineSimLitUnrolled(v: Column, q: Array[Double]): Column = {
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val vNormSq = q.indices.map { i => e(v, i) * e(v, i) }.reduce(_ + _)
    val dot = q.indices.map { i => e(v, i) * lit(q(i)) }.reduce(_ + _)
    dot / (sqrt(vNormSq) * lit(qNorm))
  }

  def cosineSimColsUnrolled(a: Column, b: Column, dim: Int): Column = {
    val na = (0 until dim).map { i => e(a, i) * e(a, i) }.reduce(_ + _)
    val nb = (0 until dim).map { i => e(b, i) * e(b, i) }.reduce(_ + _)
    val dot = (0 until dim).map { i => e(a, i) * e(b, i) }.reduce(_ + _)
    dot / (sqrt(na) * sqrt(nb))
  }

  def squaredL2ColsUnrolled(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map { i => val d = e(a, i) - e(b, i); d * d }.reduce(_ + _)

  /** Dot of `q` against the width-q.length window of `v` starting at
    * 0-based `off` — the sub-vector primitive of late-interaction
    * (MaxSim) scoring over packed multi-vector embeddings. Left-assoc
    * unrolled, so the DuckDB mirror (DuckSql.dotLitOffset) is bit-equal. */
  def dotLitOffsetUnrolled(v: Column, q: Array[Double], off: Int): Column =
    q.indices.map { i => e(v, off + i) * lit(q(i)) }.reduce(_ + _)

  /** Column-vs-column windowed dot: width-`w` windows of `a` and `b`
    * starting at 0-based `offA`/`offB` — the join form of the
    * late-interaction sub-vector primitive. */
  def dotColsOffsetUnrolled(a: Column, b: Column, w: Int, offA: Int, offB: Int): Column =
    (0 until w).map { i => e(a, offA + i) * e(b, offB + i) }.reduce(_ + _)

  // ---- generic-dim fallbacks (dim not known at plan time) ----
  // Higher-order functions: not whole-stage-codegen'd but still native.

  def squaredL2Dyn(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => { val d = x.cast(DoubleType) - y.cast(DoubleType); d * d }),
      lit(0.0), (acc, v) => acc + v)

  def l1Dyn(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => abs(x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, v) => acc + v)

  def lInfDyn(a: Column, b: Column): Column =
    array_max(zip_with(a, b, (x, y) => abs(x.cast(DoubleType) - y.cast(DoubleType))))

  // ---- driver-side scalar math (pruning bounds, tests) ----

  def squaredL2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
  def l1(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
    s
  }
  def lInf(a: Array[Double], b: Array[Double]): Double = {
    var m = 0.0; var i = 0
    while (i < a.length) { val d = math.abs(a(i) - b(i)); if (d > m) m = d; i += 1 }
    m
  }
  def mahalanobisDiag(a: Array[Double], b: Array[Double], invDiag: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d * invDiag(i); i += 1 }
    s
  }
  /** Driver-side SPD matrix inverse (Gauss-Jordan with partial pivoting) —
    * factorize the covariance ONCE here, then broadcast the flat inverse to
    * [[mahalanobisFullLit]] (the reference re-solves per pair,
    * distance_metric.py:78-80). Input and output are row-major flattened. */
  def invertSPD(mFlat: Array[Double], n: Int): Array[Double] = {
    require(mFlat.length == n * n, "matrix must be n*n")
    val a = Array.tabulate(n, 2 * n) { (i, j) =>
      if (j < n) mFlat(i * n + j) else if (j - n == i) 1.0 else 0.0
    }
    for (c <- 0 until n) {
      val pivot = (c until n).maxBy(r => math.abs(a(r)(c)))
      require(math.abs(a(pivot)(c)) > 1e-12, "matrix is singular")
      val tmp = a(c); a(c) = a(pivot); a(pivot) = tmp
      val pv = a(c)(c)
      for (j <- 0 until 2 * n) a(c)(j) /= pv
      for (r <- 0 until n if r != c) {
        val f = a(r)(c)
        if (f != 0.0) for (j <- 0 until 2 * n) a(r)(j) -= f * a(c)(j)
      }
    }
    Array.tabulate(n * n)(k => a(k / n)(n + k % n))
  }

  /** Same accumulation order (i-outer, j-inner) as VecMetricLit(MahaFull). */
  def mahalanobisFull(a: Array[Double], b: Array[Double], sinvFlat: Array[Double]): Double = {
    val n = a.length
    val d = new Array[Double](n)
    var i = 0
    while (i < n) { d(i) = a(i) - b(i); i += 1 }
    var s = 0.0; i = 0
    while (i < n) {
      var j = 0
      while (j < n) { s += d(i) * sinvFlat(i * n + j) * d(j); j += 1 }
      i += 1
    }
    s
  }
}
