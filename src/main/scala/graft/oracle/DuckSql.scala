package graft.oracle

/** Emits DuckDB SQL expression strings that compute EXACTLY the same IEEE
  * double arithmetic as the Column expressions in `graft.functions.Distances`
  * and `graft.index.Grid` — same casts, same operand order, same left-to-right
  * association — so the driver's DuckDB-oracle hash compare matches
  * bit-for-bit (SURVEY.md §7 "hard parts": float32 vectors, float64
  * distances).
  */
object DuckSql {

  /** Emit a double literal that DuckDB parses to the EXACT same double as
    * Scala's. DuckDB types plain decimal literals as DECIMAL (arbitrary
    * precision), which rounds high-precision values before the cast to
    * DOUBLE — off by ULPs — but literals with an EXPONENT are typed DOUBLE
    * directly and parsed with the same correctly-rounded strtod as a
    * VARCHAR→DOUBLE cast (verified bit-equal over 4k random doubles), so
    * the shortest round-tripping repr plus `e0` is bit-exact AND ~16 chars
    * shorter per literal than the old CAST('…' AS DOUBLE) form. Text size
    * matters: the unrolled 64-dim oracles reached 370 KB of SQL and DuckDB
    * spent multiple seconds per query just parsing/binding (r16 driver
    * sweep starvation). Non-finite values keep the CAST form ('NaN'/'Inf'
    * are not valid bare literals). */
  def fmt(d: Double): String =
    if (java.lang.Double.isFinite(d)) {
      val s = java.lang.Double.toString(d)
      if (s.indexOf('E') >= 0) s else s + "e0"
    } else s"CAST('${java.lang.Double.toString(d)}' AS DOUBLE)"

  /** `::DOUBLE` is the same cast as CAST(… AS DOUBLE), 9 chars shorter —
    * and these element casts appear twice per dim per distance term. */
  def elem(col: String, i: Int): String = s"$col[${i + 1}]::DOUBLE"

  /** Σ (v_i - q_i)^2, left-assoc — mirrors Distances.squaredL2Lit. */
  def squaredL2Lit(col: String, q: Array[Double]): String =
    q.indices.map { i =>
      val d = s"(${elem(col, i)} - (${fmt(q(i))}))"
      s"($d * $d)"
    }.mkString("(", " + ", ")")

  def l1Lit(col: String, q: Array[Double]): String =
    q.indices.map { i => s"ABS(${elem(col, i)} - (${fmt(q(i))}))" }
      .mkString("(", " + ", ")")

  def lInfLit(col: String, q: Array[Double]): String =
    q.indices.map { i => s"ABS(${elem(col, i)} - (${fmt(q(i))}))" }
      .mkString("GREATEST(", ", ", ")")

  def mahalanobisDiagLit(col: String, q: Array[Double], invDiag: Array[Double]): String =
    q.indices.map { i =>
      val d = s"(${elem(col, i)} - (${fmt(q(i))}))"
      s"(($d * $d) * (${fmt(invDiag(i))}))"
    }.mkString("(", " + ", ")")

  /** d' Sinv d, ROW-MAJOR left-assoc — term order and ((d_i * s) * d_j)
    * grouping mirror VecMetricLit(MahaFull)'s loops exactly. */
  def mahalanobisFullLit(col: String, q: Array[Double], sinvFlat: Array[Double]): String = {
    val n = q.length
    (for (i <- 0 until n; j <- 0 until n) yield {
      val di = s"(${elem(col, i)} - (${fmt(q(i))}))"
      val dj = s"(${elem(col, j)} - (${fmt(q(j))}))"
      s"(($di * (${fmt(sinvFlat(i * n + j))})) * $dj)"
    }).mkString("(", " + ", ")")
  }

  def dotLit(col: String, q: Array[Double]): String =
    q.indices.map { i => s"(${elem(col, i)} * (${fmt(q(i))}))" }
      .mkString("(", " + ", ")")

  /** Dot of `q` against the window of `col` starting at 0-based `off` —
    * mirrors Distances.dotLitOffsetUnrolled (left-assoc). */
  def dotLitOffset(col: String, q: Array[Double], off: Int): String =
    q.indices.map { i => s"(${elem(col, off + i)} * (${fmt(q(i))}))" }
      .mkString("(", " + ", ")")

  /** MaxSim (late interaction) over packed sub-vectors — mirrors
    * graft.operators.LateInteraction.maxSimLit: per (query-sub, doc-sub)
    * dot rounded to 9 decimals, GREATEST per query-sub, summed. */
  def maxSimLit(col: String, q: Array[Double], nSub: Int): String = {
    val w = q.length / nSub
    val offsets = (0 until nSub).map(_ * w)
    (0 until nSub).map { i =>
      val qi = q.slice(i * w, i * w + w)
      offsets.map { o => s"ROUND(${dotLitOffset(col, qi, o)}, 9)" }
        .mkString("GREATEST(", ", ", ")")
    }.mkString("(", " + ", ")")
  }

  /** Column-vs-column windowed dot — mirrors
    * Distances.dotColsOffsetUnrolled. */
  def dotColsOffset(a: String, b: String, w: Int, offA: Int, offB: Int): String =
    (0 until w).map { i => s"(${elem(a, offA + i)} * ${elem(b, offB + i)})" }
      .mkString("(", " + ", ")")

  /** Column-vs-column MaxSim — mirrors LateInteraction.maxSimCols. */
  def maxSimCols(a: String, b: String, dim: Int, nSub: Int): String = {
    val w = dim / nSub
    (0 until nSub).map { i =>
      (0 until nSub).map { j =>
        s"ROUND(${dotColsOffset(a, b, w, i * w, j * w)}, 9)"
      }.mkString("GREATEST(", ", ", ")")
    }.mkString("(", " + ", ")")
  }

  /** Mirrors Distances.cosineSimLit: dot / (sqrt(Σ v_i^2) * ||q||). */
  def cosineSimLit(col: String, q: Array[Double]): String = {
    val qNorm = math.sqrt(q.map(x => x * x).sum)
    val vNormSq = q.indices.map { i => s"(${elem(col, i)} * ${elem(col, i)})" }
      .mkString("(", " + ", ")")
    s"(${dotLit(col, q)} / (SQRT($vNormSq) * (${fmt(qNorm)})))"
  }

  // ---- column vs column (pairwise) ----

  def squaredL2Cols(a: String, b: String, dim: Int): String =
    (0 until dim).map { i =>
      val d = s"(${elem(a, i)} - ${elem(b, i)})"
      s"($d * $d)"
    }.mkString("(", " + ", ")")

  def dotCols(a: String, b: String, dim: Int): String =
    (0 until dim).map { i => s"(${elem(a, i)} * ${elem(b, i)})" }
      .mkString("(", " + ", ")")

  def cosineSimCols(a: String, b: String, dim: Int): String = {
    def normSq(c: String) =
      (0 until dim).map { i => s"(${elem(c, i)} * ${elem(c, i)})" }
        .mkString("(", " + ", ")")
    s"(${dotCols(a, b, dim)} / (SQRT(${normSq(a)}) * SQRT(${normSq(b)})))"
  }

  /** Table ref for a fixture table; the driver registers parquet files as
    * views named after the table, but plain read_parquet also works. */
  def table(name: String): String = name
}
