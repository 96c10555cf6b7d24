package graft

import graft.functions.Distances
import graft.index.{Grid, GridConfig}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties for the driver-side math that the pruning
  * correctness rests on (SURVEY §5: add property-based tests the reference
  * lacks). Spark-side equivalence is covered by RandomizedSpec/VecExprSpec;
  * these pin the pure-Scala invariants over the full generator space. */
class PropertySpec extends SparkSpecBase {

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: $r")
  }

  private val dimGen = Gen.choose(1, 16)
  private def vecGen(dim: Int): Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](dim, Gen.choose(-10.0, 10.0))

  test("metric axioms: non-negativity, identity, symmetry (squared L2, L1, Linf)") {
    val p = Prop.forAll(dimGen.flatMap(d => vecGen(d).flatMap(a => vecGen(d).map((a, _))))) {
      case (a, b) =>
        val fns = Seq[(Array[Double], Array[Double]) => Double](
          Distances.squaredL2, Distances.l1, Distances.lInf)
        fns.forall { f =>
          f(a, b) >= 0.0 && f(a, a) == 0.0 && f(a, b) == f(b, a)
        }
    }
    check(p, "metric axioms")
  }

  test("plane lower bound never exceeds the true distance to any point in the cell") {
    // For a random query and a random in-bounds point, the bound of the
    // point's own cell must be <= the true distance (admissibility — the
    // invariant the widening loop's stop rule depends on).
    val gen = for {
      dim <- Gen.choose(1, 6)
      parts <- Gen.choose(2, 5)
      gdims <- Gen.choose(1, dim)
      q <- vecGen(dim)
      v <- Gen.containerOfN[Array, Double](dim, Gen.choose(-1.0, 1.0))
    } yield (GridConfig(dim, -1.0, 1.0, parts, gdims), q, v)
    val p = Prop.forAll(gen) { case (cfg, q, v) =>
      val cell = Grid.cellOf(v, cfg)
      val bound = Grid.cellLowerBoundSqL2(q, cell, cfg)
      val dist = Distances.squaredL2(q, v)
      bound <= dist + 1e-9
    }
    check(p, "bound admissibility")
  }

  test("ALL metric cell bounds are admissible (the auto-pruning rule's contract)") {
    // GridRadiusPruning skips a cell when bound > r; a bound exceeding the
    // true distance of ANY in-cell point would silently drop matches.
    val gen = for {
      dim <- Gen.choose(1, 6)
      parts <- Gen.choose(2, 5)
      gdims <- Gen.choose(1, dim)
      q <- vecGen(dim)
      v <- Gen.containerOfN[Array, Double](dim, Gen.choose(-1.0, 1.0))
      inv <- Gen.containerOfN[Array, Double](dim, Gen.choose(0.1, 5.0))
    } yield (GridConfig(dim, -1.0, 1.0, parts, gdims), q, v, inv)
    val p = Prop.forAll(gen) { case (cfg, q, v, inv) =>
      val cell = Grid.cellOf(v, cfg)
      (Grid.cellLowerBoundL1(q, cell, cfg) <= Distances.l1(q, v) + 1e-9) &&
      (Grid.cellLowerBoundLInf(q, cell, cfg) <= Distances.lInf(q, v) + 1e-9) &&
      (Grid.cellLowerBoundMahalanobisDiag(q, cell, cfg, inv) <=
        q.indices.map(i => { val d = q(i) - v(i); d * d * inv(i) }).sum + 1e-9)
    }
    check(p, "all-metric bound admissibility")
  }

  test("QUANTILE grid: ALL metric interval bounds are admissible over random boundary tables") {
    // the quantile pruning rule's contract: for ANY ascending boundary
    // table (not just calibrated ones) and any point, the bound of the
    // point's own cell never exceeds the true distance — the mixed-radix
    // decode, count-of-boundaries bucketing, and open-ended edge
    // intervals must agree
    import graft.index.{QuantileGrid, QuantileGridConfig}
    val gen = for {
      dim <- Gen.choose(1, 6)
      gdims <- Gen.choose(1, dim)
      bs <- Gen.listOfN(gdims,
        Gen.choose(1, 4).flatMap(nb =>
          Gen.containerOfN[List, Double](nb, Gen.choose(-1.0, 1.0)).map(_.sorted)))
      q <- vecGen(dim)
      v <- Gen.containerOfN[Array, Double](dim, Gen.choose(-2.0, 2.0))
      inv <- Gen.containerOfN[Array, Double](dim, Gen.choose(0.1, 5.0))
    } yield (QuantileGridConfig(dim, bs.map(_.toSeq)), q, v, inv)
    val p = Prop.forAll(gen) { case (cfg, q, v, inv) =>
      val cell = QuantileGrid.cellOf(v, cfg)
      (QuantileGrid.cellLowerBoundSqL2(q, cell, cfg) <=
        Distances.squaredL2(q, v) + 1e-9) &&
      (QuantileGrid.cellLowerBoundL1(q, cell, cfg) <= Distances.l1(q, v) + 1e-9) &&
      (QuantileGrid.cellLowerBoundLInf(q, cell, cfg) <= Distances.lInf(q, v) + 1e-9) &&
      (QuantileGrid.cellLowerBoundMahalanobisDiag(q, cell, cfg, inv) <=
        q.indices.map(i => { val d = q(i) - v(i); d * d * inv(i) }).sum + 1e-9) &&
      QuantileGrid.decode(cell, cfg).toSeq ==
        (0 until cfg.gridDims).map(d => QuantileGrid.bucketOf(v(d), d, cfg))
    }
    check(p, "quantile-grid bound admissibility")
  }

  test("cellOf is total and stable over [lower,upper] plus out-of-bounds points") {
    val gen = for {
      dim <- Gen.choose(1, 6)
      parts <- Gen.choose(2, 5)
      gdims <- Gen.choose(1, dim)
      v <- Gen.containerOfN[Array, Double](dim, Gen.choose(-3.0, 3.0))
    } yield (GridConfig(dim, -1.0, 1.0, parts, gdims), v)
    val p = Prop.forAll(gen) { case (cfg, v) =>
      val c = Grid.cellOf(v, cfg)
      c >= 0 && c < cfg.numCells && c == Grid.cellOf(v, cfg)
    }
    check(p, "cellOf totality")
  }

  test("BPE merge fold equals the canonical in-memory merge on random symbol runs") {
    import spark.implicits._
    // adversarial alphabet: single chars plus tokens that LOOK like merge
    // results ("aa", "ab"), driving the sentinel/last-symbol logic hard
    val symGen = Gen.oneOf("a", "b", "c", "aa", "ab")
    val seqGen = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, symGen))
    val pairGen = for (p1 <- symGen; p2 <- symGen) yield (p1, p2)
    def model(syms: List[String], p1: String, p2: String): List[String] =
      syms.tail.foldLeft(List(syms.head)) { (acc, x) =>
        if (acc.last == p1 && x == p2) acc.init :+ (p1 + p2)
        else acc :+ x
      }
    val cases = Gen.listOfN(120, seqGen.flatMap(s => pairGen.map((s, _)))).sample.get
    val df = cases.zipWithIndex
      .map { case ((syms, _), i) => (i.toLong, syms.mkString(" ")) }
      .toDF("case_id", "sym")
    // one Spark pass per distinct pair, applied only to its own cases
    val got = cases.zipWithIndex.groupBy(_._1._2).toSeq.flatMap { case ((p1, p2), grp) =>
      val ids = grp.map(_._2.toLong)
      df.filter(col("case_id").isin(ids: _*))
        .select(col("case_id"), graft.operators.Bpe.applyMerge(col("sym"), p1, p2).as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    }.toMap
    for (((syms, (p1, p2)), i) <- cases.zipWithIndex)
      assert(got(i.toLong) == model(syms, p1, p2).mkString(" "),
        s"case $i: syms=$syms pair=($p1,$p2)")
  }

  test("qualityScoreScaled equals exact BigDecimal rational rounding on generated docs (200 cases)") {
    import spark.implicits._
    // text generator: words from a small vocab (some stopwords), so all
    // three score components exercise their clamps
    val wordGen = Gen.oneOf("the", "a", "of", "zz", "longishword", "x",
      "sesquipedalian", "to", "qqq", "abcdefgh")
    val docGen = Gen.choose(1, 120).flatMap(n => Gen.listOfN(n, wordGen))
    val docs = Gen.listOfN(200, docGen).sample.get.map(_.mkString(" "))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (d <- Seq(4, 9)) {
      val got = df.select(col("id"),
          graft.operators.TextAnalysis.qualityScoreScaled(col("text"), d))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.zipWithIndex.foreach { case (t, i) =>
        // exact rational num/(3000*nw) in BigDecimal, HALF_UP to d places
        val words = t.split(" ")
        val nw = words.length.toLong
        val len = t.length.toLong
        val ns = words.count(graft.core.Fixtures.Stopwords.contains).toLong
        val chars = len - nw + 1
        val w = if (chars >= 3 * nw && chars <= 8 * nw) 1000L else 500L
        val num = 2L * nw * math.min(len, 500L) +
          1000L * math.min(10L * ns, nw) + w * nw
        val want = (BigDecimal(num) * BigDecimal(10).pow(d) /
          BigDecimal(3000L * nw))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
        assert(got(i.toLong) == want,
          s"doc $i decimals=$d: got ${got(i.toLong)}, want $want (nw=$nw len=$len ns=$ns)")
      }
    }
  }

  test("pctlNanos equals exact BigDecimal rational rounding over the (below, n) lattice") {
    import spark.implicits._
    val cases = for (n <- 1L to 40L; below <- 0L until n) yield (below, n)
    val df = cases.toDF("below", "n")
    val got = df.select(col("below"), col("n"),
        graft.operators.Governance.pctlNanos(col("below"), col("n")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (below, n) =>
      val want =
        if (n <= 1) 0L
        else (BigDecimal(below) * BigDecimal(1000000000L) / BigDecimal(n - 1))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
      assert(got((below, n)) == want, s"below=$below n=$n")
    }
  }
}
