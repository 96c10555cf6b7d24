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

  /** Confusion matrix of [[trainPredict]]: (label_true, predicted, n). */
  def confusion(train: DataFrame, test: DataFrame,
      textCol: String = "text", labelCol: String = "lang",
      idCol: String = "doc_id"): DataFrame =
    trainPredict(train, test, textCol, labelCol, idCol)
      .groupBy(col("label_true"), col("predicted"))
      .agg(count(lit(1)).as("n"))
}
