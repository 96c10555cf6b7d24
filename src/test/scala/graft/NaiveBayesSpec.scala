package graft

import graft.core.Tables
import graft.operators.NaiveBayes
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpecBase {
  import spark.implicits._

  test("scores and argmax match hand-computed add-one smoothing") {
    val train = Seq(("a1", "A", "x x y"), ("b1", "B", "z z"))
      .toDF("doc_id", "lang", "text")
    val test = Seq(("t1", "A", "x z")).toDF("doc_id", "lang", "text")
    val got = NaiveBayes.trainPredict(train, test).collect()(0)
    // V=3; class A: cc=3, prior 1/2; class B: cc=2, prior 1/2
    def q(x: Double) = BigDecimal(math.log(x)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val scoreA = q(0.5) + (q(3.0 / 6) + q(1.0 / 6))  // x seen(2+1)/6, z unseen 1/6
    val scoreB = q(0.5) + (q(1.0 / 5) + q(3.0 / 5))  // x unseen 1/5, z seen(2+1)/5
    assert(scoreB > scoreA)
    assert(got.getAs[String]("predicted") === "B")
    assert(BigDecimal(got.getAs[java.math.BigDecimal]("score")) === scoreB)
  }

  test("ties break on class name ascending; empty tokens ignored") {
    val train = Seq(("a1", "A", "x"), ("b1", "B", "x"))
      .toDF("doc_id", "lang", "text")
    // identical likelihoods and priors for both classes -> tie -> "A"
    val test = Seq(("t1", "B", "x  x")).toDF("doc_id", "lang", "text")
    val got = NaiveBayes.trainPredict(train, test).collect()(0)
    assert(got.getAs[String]("predicted") === "A")
    assert(got.getAs[String]("label_true") === "B")
  }

  test("token-empty test docs keep their row (classified by priors alone)") {
    val train = Seq(("a1", "A", "x"), ("a2", "A", "y"), ("b1", "B", "z"))
      .toDF("doc_id", "lang", "text")
    val test = Seq(("t1", "B", ""), ("t2", "A", "   "), ("t3", "A", "x"))
      .toDF("doc_id", "lang", "text")
    val got = NaiveBayes.trainPredict(train, test)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got.size === 3)
    // empty docs fall back to the larger prior (A has 2 of 3 train docs)
    assert(got("t1") === "A" && got("t2") === "A" && got("t3") === "A")
  }

  test("a class whose training texts are all empty stays predictable") {
    val train = Seq(("a1", "A", "x y"), ("b1", "B", ""), ("b2", "B", ""))
      .toDF("doc_id", "lang", "text")
    val test = Seq(("t1", "A", ""), ("t2", "A", "q")).toDF("doc_id", "lang", "text")
    val got = NaiveBayes.trainPredict(train, test)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // B has the larger prior (2/3): the empty doc and the all-unseen doc
    // must both resolve, and B must be reachable despite zero tokens
    assert(got.size === 2)
    assert(got("t1") === "B")
  }

  test("fused scorer == relational scorer, bit for bit (fixture + edge cases)") {
    // the r11 kernel (NbPredictExpr over the collected model) must return
    // the SAME (predicted, DECIMAL(29,9) score) as the relational
    // explode + model-join + decimal-sum form it replaced
    val docs = Tables.documents(spark, sfDir)
    val cases: Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
      (docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1)),
      // class with empty training texts + all-unseen and token-empty tests
      (Seq(("a1", "A", "x y"), ("b1", "B", ""), ("b2", "B", "")).toDF("doc_id", "lang", "text"),
        Seq(("t1", "A", ""), ("t2", "A", "q"), ("t3", "B", "x x  y")).toDF("doc_id", "lang", "text"))
    )
    cases.foreach { case (train, test) =>
      def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getString(2),
          r.getAs[java.math.BigDecimal]("score")))
        .sortBy(_._1)
      val a = norm(NaiveBayes.trainPredict(train, test))
      val b = norm(NaiveBayes.trainPredictFused(train, test))
      // model-cap fallback (the 100 TB dirty-vocab guard): forcing the cap
      // below the vocab size must route to the relational path, same answer
      val c = norm(NaiveBayes.trainPredictFused(train, test, maxModelRows = 1))
      assert(a.length == b.length && a.length == c.length)
      a.zip(b).zip(c).foreach { case ((x, y), z) =>
        assert(x._1 == y._1 && x._2 == y._2 && x._3 == y._3, s"$x vs $y")
        assert(x._4.compareTo(y._4) == 0, s"score drift: $x vs $y")
        assert(x._3 == z._3 && x._4.compareTo(z._4) == 0, s"fallback drift: $x vs $z")
      }
    }
  }

  test("cell cap: |V|·|C| over budget routes to relational fallback even when row count fits") {
    // disjoint per-class vocabularies: 9 collected (class, word) rows but
    // 9 words × 3 classes = 27 model cells — the worst case where the lps
    // array outgrows the row cap by a factor of |C|
    val train = Seq(("a1", "A", "w1 w2 w3"), ("b1", "B", "w4 w5 w6"),
      ("c1", "C", "w7 w8 w9")).toDF("doc_id", "lang", "text")
    val test = Seq(("t1", "A", "w1 w5 w9 q")).toDF("doc_id", "lang", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(2), r.getAs[java.math.BigDecimal]("score")))
      .sortBy(_._1).toSeq
    // rows (9) ≤ cap (10) but cells (27) > cap → must fall back, same answer
    val capped = norm(NaiveBayes.trainPredictFused(train, test, maxModelRows = 10))
    val full = norm(NaiveBayes.trainPredictFused(train, test))
    assert(capped.map(t => (t._1, t._2)) == full.map(t => (t._1, t._2)))
    capped.zip(full).foreach { case (x, y) => assert(x._3.compareTo(y._3) == 0) }
  }

  test("fused == relational on seeded random unicode corpora (40 docs x 3 classes)") {
    val vocab = Vector("alpha", "beta", "γάμμα", "δ", "naïve", "🙂x", "e", "",
      "longertoken", "x", "ZZ", "mixedCase")
    val rnd = new scala.util.Random(97)
    def corpus(n: Int, offset: Int) = (0 until n).map { i =>
      val words = (0 until rnd.nextInt(15)).map(_ => vocab(rnd.nextInt(vocab.size)))
      ((i + offset).toString, s"C${rnd.nextInt(3)}", words.mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val train = corpus(40, 0)
    val test = corpus(25, 1000)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(2), r.getAs[java.math.BigDecimal](3)))
      .sortBy(_._1)
    val a = norm(NaiveBayes.trainPredict(train, test))
    val b = norm(NaiveBayes.trainPredictFused(train, test))
    assert(a.length == b.length && a.length == 25)
    a.zip(b).foreach { case (x, y) =>
      assert(x._1 == y._1 && x._2 == y._2 && x._3.compareTo(y._3) == 0, s"$x vs $y")
    }
  }

  test("fixture confusion matrix: every test doc classified exactly once") {
    val docs = Tables.documents(spark, sfDir)
    val conf = NaiveBayes.confusion(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1))
    val total = conf.agg(sum("n")).collect()(0).getLong(0)
    assert(total === docs.filter(col("doc_id") % 2 === 1).count())
    // the fixture langs share most vocabulary (lang-ID there is stopword-
    // ratio based), so require better-than-chance, not dominance: the
    // diagonal must beat the 1/5 random-assignment mass
    val rows = conf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val diag = rows.collect { case ((t, p), n) if t == p => n }.sum
    assert(diag * 5 > total, s"diagonal $diag of $total")
  }
}
