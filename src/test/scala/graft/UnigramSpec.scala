package graft

import graft.operators.Unigram
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpecBase {
  import spark.implicits._

  private val cfgSmall = Unigram.Config(
    maxPieceLen = 3, seedSize = 24, vocabSize = 10, emIters = 2, maxWordLen = 10)

  test("viterbi fold matches the local DP incl. micro-score ties") {
    // hand vocab with a deliberate tie: score(ab) == score(a)+score(b)
    val scores = Seq("a" -> -5L, "b" -> -5L, "ab" -> -10L, "c" -> -3L,
      "abc" -> -7L)
    val words = Seq("ab", "abc", "ababc", "ccc", "bca").toDF("word")
    val got = words.select(col("word"),
      ltrim(Unigram.viterbiBest(col("word"), scores, 3)).as("g"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((w, g) <- got) {
      val local = Unigram.viterbiLocal(w, scores.toMap, 3).mkString(" ")
      assert(g == local, s"word $w: spark=$g local=$local")
      // tie case: 'ab' has paths 'a b' (score -10) and 'ab' (-10); the
      // lexicographically smaller segmentation string must win
      if (w == "ab") assert(g == "a b")
    }
  }

  test("randomized corpora: Spark training == local mirror (vocab + token counts)") {
    val rnd = new scala.util.Random(2014)
    for (trial <- 0 until 5) {
      val alphabet = "abcde".take(3 + rnd.nextInt(3))
      def word() = (0 until (1 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val docs = (0 until 30).map(i =>
        (i.toLong, (0 until (2 + rnd.nextInt(10))).map(_ => word()).mkString(" ")))
      val df = docs.toDF("doc_id", "text")
      // driverDictLimit = 0 forces the DISTRIBUTED loop — this is the
      // distributed ≡ local-mirror pin (the driver fast path IS the
      // mirror, so it is covered by construction + the oracle gate)
      val (vocabDf, sf) = Unigram.train(df, cfgSmall, driverDictLimit = 0)
      val gotVocab = vocabDf.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val gotCounts = Unigram.encodeTokenCounts(df, sf, cfgSmall).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val (expVocab, expCounts) = Unigram.trainLocal(docs, cfgSmall)
      assert(gotVocab == expVocab, s"trial $trial vocab mismatch")
      assert(gotCounts == expCounts, s"trial $trial token counts mismatch")
      // the default (cost-based driver) path returns the same vocab table
      // and the same scores
      val (vocabDf2, sf2) = Unigram.train(df, cfgSmall)
      val gotVocab2 = vocabDf2.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotVocab2 == expVocab, s"trial $trial driver-path vocab mismatch")
      assert(sf2 == sf, s"trial $trial driver-path scores mismatch")
    }
  }

  test("non-BMP corpora skip the driver fast path and stay code-point-exact") {
    import spark.implicits._
    // one word carries a supplementary-plane char (2 UTF-16 units, 1 code
    // point): the local mirror indexes by UTF-16 units, so the driver
    // fast path must refuse and route to the distributed loop — default
    // and forced-distributed training must agree exactly
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq(
      (0L, s"ab${emoji}a ab ab"),
      (1L, s"ba a${emoji} ab"),
      (2L, "aa ab ba")).toDF("doc_id", "text")
    val cfg = Unigram.Config(maxPieceLen = 2, seedSize = 16, vocabSize = 8,
      emIters = 1, maxWordLen = 6)
    val dflt = Unigram.train(docs, cfg)
    val dist = Unigram.train(docs, cfg, driverDictLimit = 0)
    assert(dflt._2 == dist._2, "scores must come from the distributed loop")
    assert(dflt._1.collect().toSeq == dist._1.collect().toSeq)
    // the supplementary char is a single vocab piece (code point), and
    // every word still encodes
    val pieces = dflt._2.map(_._1)
    assert(pieces.contains(emoji), s"emoji must be a single-char piece in $pieces")
    val enc = Unigram.encodeTokenCounts(docs, dflt._2, cfg).collect()
    assert(enc.length == 3 && enc.forall(_.getLong(1) > 0))
  }

  test("vocab invariants: chars always present, size bounded, encode covers every word") {
    val docs = Seq(
      (1L, "banana bandana banana cabana"),
      (2L, "an ana banana nan"),
      (3L, "dana ban cab")).toDF("doc_id", "text")
    val cfg = Unigram.Config(maxPieceLen = 4, seedSize = 16, vocabSize = 6,
      emIters = 2, maxWordLen = 10)
    val (vocab, sf) = Unigram.train(docs, cfg)
    val pieces = vocab.select("piece").as[String].collect().toSet
    val chars = Set("a", "b", "c", "d", "n")
    assert(chars.subsetOf(pieces), s"single chars missing: ${chars -- pieces}")
    // bounded by vocabSize + |chars| (chars are force-kept)
    assert(pieces.size <= cfg.vocabSize + chars.size)
    // every corpus word tokenizes (total chars reconstruct)
    val enc = Unigram.encodeTokenCounts(docs, sf, cfg).collect()
    assert(enc.length == 3 && enc.forall(r => r.getLong(1) >= 1L))
  }

  test("maxWordLen fail-fast: an over-long dictionary word aborts training") {
    val docs = Seq((1L, "short " + "x" * 20)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Unigram.train(docs, cfgSmall)
    }
    assert(e.getMessage.contains("maxWordLen"))
  }
}
