package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash kernel: shingle → md5 → k permutations, fused.
  *
  * The unfused pipeline (split → transform/slice/concat shingles →
  * array_distinct → explode → md5 hex → conv → 8 pmod aggs → groupBy min)
  * materializes a (doc × shingle) row set, runs md5 through hex-string
  * formatting + base-conversion parsing per shingle, and pays a shuffle
  * for the per-doc min — ~60% of the 10M-doc near-dup wall clock
  * (SCALE_NOTES). This kernel walks each document once: build the w-gram
  * in a reused StringBuilder, hash its UTF-8 bytes, fold the k
  * (a·h + b) mod p mins in registers. No explode, no shuffle, no hex
  * round-trip — and bit-identical outputs:
  *   - word split matches Spark `split(text, " ")` (Java split, limit -1);
  *   - h = first 4 digest bytes big-endian = `conv(substr(md5(s),1,8),16,10)`;
  *   - duplicate shingles are NOT deduped — min is idempotent, so the
  *     dropped `array_distinct` cannot change any signature value;
  *   - a·h + b < 2^62 stays non-negative, so `%` equals `pmod`.
  */
object MinHashKernel extends Serializable {

  // one digest + builder per executor thread, not per document — the
  // getInstance provider lookup and builder allocation are measurable at
  // 10M rows (the object lives per-JVM; ThreadLocal makes reuse safe
  // under concurrent tasks)
  private val mdLocal = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val sbLocal = ThreadLocal.withInitial[java.lang.StringBuilder](
    () => new java.lang.StringBuilder(64))

  /** Signature of `text`, or null when the doc has no w-shingle (fewer
    * than w words) — callers filter null rows, mirroring the groupBy form
    * that simply produced no row for such docs. */
  def sig(s: UTF8String, w: Int, as: Array[Long], bs: Array[Long],
      p: Long): ArrayData = {
    if (s == null) return null
    val words = s.toString.split(" ", -1)
    val n = words.length - w + 1
    if (n <= 0) return null
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val md = mdLocal.get()
    val sb = sbLocal.get()
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var t = 0
      while (t < k) {
        val v = (as(t) * h + bs(t)) % p
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }
}

/** Codegen wrapper over [[MinHashKernel.sig]] — stays inside whole-stage
  * codegen (one static call per row; the loop itself is plain JVM code,
  * which JITs as well as generated Java here since it is string/digest
  * bound, not expression-tree bound).
  *
  * Coefficients are `Seq[Long]` (value equality), not arrays: a catalyst
  * case class with array fields compares them by REFERENCE, so two
  * structurally identical expressions would never be `semanticEquals` and
  * subexpression elimination / canonicalization could not dedupe them. */
case class MinHashSigExpr(child: Expression, w: Int,
    as: Seq[Long], bs: Seq[Long], p: Long) extends UnaryExpression {

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text must be STRING, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sig(input.asInstanceOf[UTF8String], w, aArr, bArr, p)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, t => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.MinHashKernel.sig($t, $w, $aRef, $bRef, ${p}L);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })
  }
}

/** One-pass Bloom-membership counter over a document's DISTINCT word
  * n-grams (r17): builds each n-gram in a reused builder, dedups via a
  * per-call hash set, computes the same two 32-bit md5 hashes as the
  * unfused form (`md5Int32(g)` and `md5Int32("b:" + g)`), probes the k
  * Kirsch–Mitzenmacher positions `(h1 + i·h2) mod mBits` against the
  * driver-built bitmask, and counts grams with all k bits set — exactly
  * `sum(member)` of Decontam.bloomNgramFlags' exploded form, without the
  * shingle HOF (a CodegenFallback), the per-gram string rows, the explode,
  * or the per-doc aggregation shuffle. Bit positions and dedup semantics
  * are pinned equal in DecontamSpec. */
object BloomNgramKernel extends Serializable {
  private val mdLocal = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val sbLocal = ThreadLocal.withInitial[java.lang.StringBuilder](
    () => new java.lang.StringBuilder(64))

  private def h32(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Count of DISTINCT n-grams of `s` whose k Bloom positions are all set
    * in `mask` (mBits must be a power of two). 0 for docs with no n-gram. */
  def flaggedCount(s: UTF8String, n: Int, mask: Array[Long], mBits: Int,
      k: Int): Long = {
    if (s == null) return 0L
    val words = s.toString.split(" ", -1)
    val m = words.length - n + 1
    if (m <= 0) return 0L
    val seen = new java.util.HashSet[String]()
    val md = mdLocal.get()
    val sb = sbLocal.get()
    var cnt = 0L
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val g = sb.toString
      if (seen.add(g)) {
        val h1 = h32(md, g)
        val h2 = h32(md, "b:" + g)
        var t = 0
        var all = true
        while (all && t < k) {
          val p = ((h1 + t.toLong * h2) % mBits).toInt
          all = (mask(p >> 6) & (1L << (p & 63))) != 0L
          t += 1
        }
        if (all) cnt += 1
      }
      i += 1
    }
    cnt
  }
}

/** Codegen wrapper over [[BloomNgramKernel.flaggedCount]] — one static call
  * per row, stays inside whole-stage codegen. `mask` is a Seq for value
  * equality (semanticEquals / subexpression elimination — the
  * MinHashSigExpr precedent). */
case class BloomNgramFlagCount(child: Expression, n: Int, mask: Seq[Long],
    mBits: Int, k: Int) extends UnaryExpression {

  @transient private lazy val maskArr: Array[Long] = mask.toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text must be STRING, got ${other.catalogString}")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomNgramFlagCount =
    copy(child = newChild)
  override def prettyName: String = "bloom_ngram_flag_count"

  override def nullSafeEval(input: Any): Any =
    BloomNgramKernel.flaggedCount(input.asInstanceOf[UTF8String], n, maskArr, mBits, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bloomMask", maskArr, "long[]")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.BloomNgramKernel.flaggedCount($t, $n, $mRef, $mBits, $k);")
  }
}
