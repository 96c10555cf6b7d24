package graft

import graft.operators.SuffixArray
import org.scalatest.funsuite.AnyFunSuite

class SuffixArraySpec extends AnyFunSuite {

  private def bruteLongestRepeat(s: String): Int = {
    var best = 0
    for (i <- s.indices; j <- (i + 1) until s.length) {
      var l = 0
      while (j + l < s.length && s(i + l) == s(j + l)) l += 1
      if (l > best) best = l
    }
    best
  }

  private def bruteGramCoverage(s: String, minLen: Int): Int = {
    if (s.length < minLen) return 0
    val starts = (0 to s.length - minLen)
      .groupBy(i => s.substring(i, i + minLen))
      .values.filter(_.size > 1).flatten
    starts.flatMap(w => w until math.min(s.length, w + minLen)).toSet.size
  }

  test("suffix array is the lexicographic order of all suffixes") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 30) {
      val n = 1 + rnd.nextInt(200)
      val s = Array.fill(n)(('a' + rnd.nextInt(3)).toChar).mkString
      val sa = SuffixArray.build(s)
      val want = s.indices.sortBy(s.substring(_))
      assert(sa.toSeq == want, s"input: $s")
    }
  }

  test("lcp array matches direct common-prefix lengths of adjacent suffixes") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 20) {
      val n = 2 + rnd.nextInt(150)
      val s = Array.fill(n)(('a' + rnd.nextInt(2)).toChar).mkString
      val sa = SuffixArray.build(s)
      val l = SuffixArray.lcp(s, sa)
      for (i <- 0 until n - 1) {
        val a = s.substring(sa(i)); val b = s.substring(sa(i + 1))
        val want = a.zip(b).takeWhile { case (x, y) => x == y }.size
        assert(l(i) == want, s"input: $s at $i")
      }
    }
  }

  test("longestRepeat equals the O(n^2) brute force on random small-alphabet strings") {
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(300)
      val s = Array.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
      assert(SuffixArray.longestRepeat(s) == bruteLongestRepeat(s), s"input: $s")
    }
  }

  test("repeatCoverage equals exact L-gram coverage (the oracle identity)") {
    val rnd = new scala.util.Random(19)
    for (_ <- 0 until 50; minLen <- Seq(2, 3, 5)) {
      val n = rnd.nextInt(250)
      val s = Array.fill(n)(('a' + rnd.nextInt(3)).toChar).mkString
      assert(SuffixArray.repeatCoverage(s, minLen) == bruteGramCoverage(s, minLen),
        s"minLen=$minLen input: $s")
    }
  }

  test("non-BMP text counts code points, not UTF-16 units (oracle parity)") {
    // "😀a😀a": 4 code points but 6 UTF-16 units. The longest repeated
    // substring is "😀a" = 2 code points; char-unit counting (the pre-fix
    // behavior) reported 3 (surrogate pair counted as two), diverging from
    // DuckDB's code-point `length`/`substring` semantics.
    val s = "😀a😀a"
    assert(SuffixArray.longestRepeat(s) == 2)
    // minLen=2 coverage: the duplicated 2-gram "😀a" (at code-point
    // positions 0 and 2) covers all 4 positions. Char-unit counting said 6.
    assert(SuffixArray.repeatCoverage(s, 2) == 4)
    // pure-BMP strings are unaffected
    assert(SuffixArray.longestRepeat("abab") == 2)
  }

  test("edge cases: empty, single char, uniform run, no-repeat string") {
    assert(SuffixArray.longestRepeat("") == 0)
    assert(SuffixArray.longestRepeat("x") == 0)
    assert(SuffixArray.longestRepeat("aaaa") == 3)
    assert(SuffixArray.repeatCoverage("aaaa", 2) == 4)
    assert(SuffixArray.repeatCoverage("aaaa", 4) == 0)
    assert(SuffixArray.longestRepeat("abcdefg") == 0)
    assert(SuffixArray.repeatCoverage("abcdefg", 2) == 0)
  }
}
