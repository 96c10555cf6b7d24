package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multinomial Naive Bayes text classification — the supervised sibling of
  * [[LangModel]]'s unsupervised perplexity filter, and the TRAINING side of
  * a corpus-curation classifier (the fastText-shape scorer in
  * [[TextAnalysis]] uses fixed weights; here the weights are LEARNED from
  * labeled documents).
  *
  * Training is exactly two flat aggregations over the labeled corpus —
  * per-(class, word) counts and per-class totals — so it map-side combines
  * and shuffles only dictionary-sized data; there is no iterative pass
  * (the closed-form MLE is the whole fit). Scoring broadcasts the model:
  * score(doc, c) = ln P(c) + Σ_tokens ln((count(c,w)+1) / (total(c)+V))
  * with add-one smoothing and the unseen-word fallback ln(1/(total(c)+V)).
  *
  * Engine-exactness: every ln term is rounded to 9 decimals and summed as
  * DECIMAL (order-independent, the repo-wide quantized-transcendental
  * rule); the argmax orders by the exact decimal score with a class-name
  * tie-break, so predictions replay bit-for-bit in the SQL oracle.
  */
object NaiveBayes {

  // DECIMAL(18,9), not (28,9): sum((28,9)) is already (38,9), and adding
  // the (28,9) prior would overflow precision 38 — Spark then silently
  // REDUCES the scale to 8 and the oracle comparison loses a digit.
  // (18,9) keeps sum at (28,9) and the final addition at (29,9).
  private def qlog(x: org.apache.spark.sql.Column) =
    round(log(x), 9).cast(DecimalType(18, 9))

  /** Train on `train` (labelCol, textCol) and predict for `test`
    * (idCol, labelCol, textCol). Output: one row per test doc —
    * (idCol, true label as `label_true`, `predicted`, decimal `score`).
    * Tokens are whitespace words; empty tokens are ignored. */
  def trainPredict(train: DataFrame, test: DataFrame,
      textCol: String = "text", labelCol: String = "lang",
      idCol: String = "doc_id"): DataFrame = {
    // persisted: the exploded token table feeds three consumers (class-
    // word counts, class totals, vocabulary size) — without it the
    // tokenize lineage re-scans the corpus per consumer
    val toks = train
      .select(col(labelCol).as("cls"), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cw = toks.groupBy(col("cls"), col("w")).agg(count(lit(1)).as("cw"))
    // model scalars stay IN the plan (no eager count jobs at build time):
    // |V| rides along as a one-row broadcast cross join, and the prior's
    // denominator is the window sum of the per-class doc counts (== total
    // docs; the class table is dictionary-sized, so the unpartitioned
    // window is a no-op shuffle). Same doubles in, same decimals out.
    val vDf = toks.select(col("w")).distinct().agg(count(lit(1)).as("v"))
    // class list and priors come from the DOCS, not the token stream — a
    // class whose training texts are all empty still has a prior and must
    // stay predictable (its likelihoods are all the unseen fallback)
    val classes = train.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
    val priors = classes.select(col("cls"),
      qlog(col("nd").cast("double") /
        sum(col("nd")).over(Window.partitionBy()).cast("double")).as("prior_lp"))
    val cc = classes.join(
        toks.groupBy(col("cls")).agg(count(lit(1)).as("cc0")), Seq("cls"), "left")
      .crossJoin(broadcast(vDf))
      .select(col("cls"), coalesce(col("cc0"), lit(0L)).as("cc"), col("v"))
    val unseen = cc.select(col("cls"),
      qlog(lit(1.0) / (col("cc") + col("v")).cast("double")).as("unseen_lp"))
    val lik = cw.join(cc, "cls")
      .select(col("cls"), col("w"),
        qlog((col("cw") + 1).cast("double") / (col("cc") + col("v")).cast("double")).as("lp"))
    // collapse the test token stream to (doc, word, tf) BEFORE the ×|C|
    // class expansion and the model join — tf·lp in exact decimals equals
    // the per-occurrence sum term for term (decimal multiply by an
    // integer is exact; the (18,9) re-cast holds to |lp|·tf ≈ 1e9, far
    // past any real document), so scores are bit-identical while the
    // join and shuffle see distinct words, not occurrences
    val testToks = test
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("tf"))
    val ll = testToks
      .crossJoin(broadcast(unseen))
      .join(broadcast(lik), Seq("cls", "w"), "left")
      .withColumn("term",
        (coalesce(col("lp"), col("unseen_lp")) *
          col("tf").cast(DecimalType(9, 0))).cast(DecimalType(18, 9)))
      .groupBy(col(idCol), col("cls"))
      .agg(sum(col("term")).as("ll"))
    // every (test doc × class) pair scores — a token-empty doc keeps its
    // row and is classified by the priors alone (ll contributes 0)
    val scores = test.select(col(idCol), col(labelCol).as("label_true"))
      .crossJoin(broadcast(classes.select(col("cls"))))
      .join(ll, Seq(idCol, "cls"), "left")
      .join(broadcast(priors), "cls")
      .withColumn("score",
        col("prior_lp") + coalesce(col("ll"), lit(0).cast(DecimalType(28, 9))))
    val byDoc = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("cls").asc)
    scores.withColumn("__rn", row_number().over(byDoc))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label_true"), col("cls").as("predicted"),
        col("score"))
  }

  /** [[trainPredict]], fused (r11): the closed-form fit runs as two small
    * aggregation jobs whose results collect into a driver-side model (the
    * broadcast-model assumption every scorer here already makes — the
    * model is dictionary-sized, not corpus-sized), and scoring is ONE
    * codegen'd expression per test doc ([[graft.functions.NbPredictExpr]])
    * — no token explode, no (doc, word) shuffle, no ×|classes| expansion,
    * no model join. Bit-identical to [[trainPredict]] (NaiveBayesSpec):
    * the kernel accumulates the SAME DECIMAL(18,9) ln terms as unscaled
    * longs, and java Math.log + HALF_UP-scale-9 on the driver is exactly
    * Spark's `round(log(x), 9)`.
    *
    * At 100 TB the fit aggregations shuffle only dictionary-sized data
    * (map-side combine) and the collect is |C|·|V| rows — the same scale
    * contract as the DSIR/bigram-LM broadcast models. */
  def trainPredictFused(train: DataFrame, test: DataFrame,
      textCol: String = "text", labelCol: String = "lang",
      idCol: String = "doc_id", maxModelRows: Int = 2000000): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def q9(x: Double): Long =
      java.math.BigDecimal.valueOf(math.log(x))
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    // fit job 1: per-(class, word) token counts — the whole model body.
    // Bounded collect (the cost-based-path pattern): a curated corpus's
    // model is dictionary-sized, but a DIRTY web-scale corpus's raw vocab
    // (urls, typos, binary junk) is not — above the cap the driver-side
    // model would be the OOM, so fall back to the relational scorer,
    // whose model stays distributed (broadcast joins of DataFrames).
    // Same answer either way (the fused ≡ relational spec contract).
    val cwDf = train
      .select(col(labelCol).as("cls"), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("cls"), col("w")).agg(count(lit(1)).as("cw"))
    val cwBounded = cwDf.limit(maxModelRows + 1).collect()
    if (cwBounded.length > maxModelRows)
      return trainPredict(train, test, textCol, labelCol, idCol)
    val cwRows = cwBounded.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // fit job 2: per-class doc counts (a class of all-empty texts still
    // has a prior — same contract as the relational form)
    val classRows = train.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val classes = classRows.map(_._1).sorted
    val cIdx = classes.zipWithIndex.toMap
    val nDocs = classRows.map(_._2).sum
    val priors = {
      val nd = classRows.toMap
      classes.map(c => q9(nd(c).toDouble / nDocs.toDouble))
    }
    val cc = new Array[Long](classes.length)
    cwRows.foreach { case (c, _, n) => cc(cIdx(c)) += n }
    val v = cwRows.iterator.map(_._2).toSet.size.toLong
    val unseen = classes.indices.map(ci => q9(1.0 / (cc(ci) + v).toDouble))
    val words = cwRows.iterator.map(_._2).toSet.toSeq.sorted
    // the model allocates |V|·|C| cells — up to |C|× the collected row
    // count when words concentrate in single classes, so the row cap alone
    // does not bound the array (50 classes × 2M one-class rows ≈ 800 MB of
    // longs). Gate the CELL count by the same budget and fall back to the
    // relational scorer, whose model stays distributed.
    if (words.size.toLong * classes.length > maxModelRows)
      return trainPredict(train, test, textCol, labelCol, idCol)
    val wIdx = words.zipWithIndex.toMap
    // default every (word, class) cell to the unseen fallback — a word
    // seen only in SOME classes scores the fallback in the others, exactly
    // the relational left-join + COALESCE(lp, unseen_lp)
    val lps = Array.tabulate(words.size * classes.length)(i => unseen(i % classes.length))
    cwRows.foreach { case (c, w, n) =>
      lps(wIdx(w) * classes.length + cIdx(c)) =
        q9((n + 1).toDouble / (cc(cIdx(c)) + v).toDouble)
    }
    val model = graft.functions.NbScoreKernel.Model(
      classes.toSeq, priors.toSeq, unseen, words, lps.toSeq)
    val p = ColumnBridge.column(graft.functions.NbPredictExpr(
      ColumnBridge.expression(coalesce(col(textCol), lit(""))), model))
    test.select(col(idCol), col(labelCol).as("label_true"), p.as("__p"))
      .select(col(idCol), col("label_true"),
        col("__p.predicted").as("predicted"), col("__p.score").as("score"))
  }

  /** Confusion matrix over the fused scorer: (label_true, predicted, n).
    * ([[trainPredictFused]] ≡ [[trainPredict]] is pinned in
    * NaiveBayesSpec, so the matrix is unchanged from the relational form.) */
  def confusion(train: DataFrame, test: DataFrame,
      textCol: String = "text", labelCol: String = "lang",
      idCol: String = "doc_id"): DataFrame =
    trainPredictFused(train, test, textCol, labelCol, idCol)
      .groupBy(col("label_true"), col("predicted"))
      .agg(count(lit(1)).as("n"))
}
