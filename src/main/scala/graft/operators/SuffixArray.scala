package graft.operators

/** Exact substring-repeat machinery via suffix arrays — the Lee et al.
  * ("Deduplicating Training Data Makes Language Models Better", 2022)
  * primitive that the n-gram span approximation in [[Dedup.repeatedNgramSpans]]
  * approaches from the hashed side. Per-document arrays are built with
  * prefix doubling (O(n log² n)) + Kasai's LCP (O(n)); the operators are
  * pure per-row functions, so the distributed form is a map over the
  * corpus — no shuffle, no cross-document state, the shape that scales to
  * any corpus size (each task holds ONE document's array).
  *
  * Positions and lengths are counted in UNICODE CODE POINTS, not UTF-16
  * code units: the DuckDB oracle's `length`/`substring` are code-point
  * based, so a surrogate pair (non-BMP text) must count as ONE — the
  * string is decoded once via `codePoints()` and every index below is a
  * code-point index. (ASCII/BMP text is unaffected: one unit = one point.)
  *
  * Correctness identity used by the hash-gated queries (proven in
  * SuffixArraySpec and exploited by the DuckDB oracles): a position lies
  * inside some duplicated substring of length ≥ L iff it lies inside some
  * duplicated L-gram — every duplicated substring of length ≥ L contains
  * only duplicated L-windows, and any L-window containing the position can
  * be chosen inside the substring. So SA coverage (union of [w, w+l_w)
  * over suffixes whose max-neighbor LCP l_w ≥ L) equals exact-L-gram
  * coverage, which plain SQL can replay.
  *
  * The reference has no text machinery at all (numpy vectors only,
  * vectordb/kd_tree_database.py); this is north-star surface.
  */
object SuffixArray {

  /** Decode to code points — the index space for everything below. */
  private def codePoints(s: String): Array[Int] = {
    if (s == null) return Array.empty
    val out = new Array[Int](s.codePointCount(0, s.length))
    var ci = 0; var i = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      out(i) = cp; i += 1
      ci += Character.charCount(cp)
    }
    out
  }

  /** Suffix array by prefix doubling — indices of suffixes in
    * lexicographic order. O(n log² n) with a comparison sort per round;
    * fine for per-document sizes (the corpus-scale parallelism is across
    * documents, not within one). */
  def build(s: String): Array[Int] = buildCp(codePoints(s))

  private[operators] def buildCp(cp: Array[Int]): Array[Int] = {
    val n = cp.length
    if (n == 0) return Array.empty
    var sa = (0 until n).toArray
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(i) = cp(i); i += 1 }
    val tmp = new Array[Int](n)
    var k = 1
    var done = n == 1
    while (!done) {
      def pairKey(p: Int): Long = {
        val second = if (p + k < n) rank(p + k) + 1 else 0
        // initial ranks are code points ≤ 0x10FFFF < 2^21; later rounds
        // ranks < n, guarded below — the packed key stays collision-free
        (rank(p).toLong << 21) | second.toLong
      }
      // n can exceed 2^21 for huge docs — fall back to tuple sort there
      if (n < (1 << 21)) sa = sa.sortBy(pairKey)
      else sa = sa.sortBy(p => (rank(p), if (p + k < n) rank(p + k) else -1))
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        val a = sa(i - 1); val b = sa(i)
        val same = rank(a) == rank(b) &&
          (if (a + k < n) rank(a + k) else -1) == (if (b + k < n) rank(b + k) else -1)
        tmp(b) = tmp(a) + (if (same) 0 else 1)
        i += 1
      }
      Array.copy(tmp, 0, rank, 0, n)
      done = rank(sa(n - 1)) == n - 1
      k <<= 1
    }
    sa
  }

  /** Kasai LCP array: lcp(i) = common-prefix length of sa(i) and sa(i+1). */
  def lcp(s: String, sa: Array[Int]): Array[Int] = lcpCp(codePoints(s), sa)

  private[operators] def lcpCp(cp: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = cp.length
    if (n < 2) return Array.empty
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val out = new Array[Int](n - 1)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && cp(i + h) == cp(j + h)) h += 1
        out(rank(i) - 1) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    out
  }

  /** Length (in code points) of the longest substring occurring ≥ 2 times
    * in `s` (possibly overlapping) — the max LCP of SA-adjacent suffixes. */
  def longestRepeat(s: String): Int = {
    val cp = codePoints(s)
    if (cp.length < 2) return 0
    val l = lcpCp(cp, buildCp(cp))
    var m = 0; var i = 0
    while (i < l.length) { if (l(i) > m) m = l(i); i += 1 }
    m
  }

  /** Number of code-point positions of `s` lying inside some
    * INTRA-document repeated substring of length ≥ `minLen` — the
    * per-document duplicated-text mass Lee et al. would cut. Computed from
    * the SA: suffix w's duplicated-prefix length l_w = max(LCP to either
    * SA neighbor); the union of [w, w + l_w) over l_w ≥ minLen is exactly
    * the covered set (see object doc for the identity with L-gram
    * coverage). */
  def repeatCoverage(s: String, minLen: Int): Int = {
    val cp = codePoints(s)
    val n = cp.length
    if (n < 2 || n < minLen) return 0
    val sa = buildCp(cp)
    val l = lcpCp(cp, sa)
    val covered = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val left = if (i > 0) l(i - 1) else 0
      val right = if (i < n - 1) l(i) else 0
      val lw = math.max(left, right)
      if (lw >= minLen) {
        val w = sa(i)
        var p = w
        val end = math.min(n, w + lw)
        while (p < end) { covered(p) = true; p += 1 }
      }
      i += 1
    }
    var c = 0; i = 0
    while (i < n) { if (covered(i)) c += 1; i += 1 }
    c
  }
}
