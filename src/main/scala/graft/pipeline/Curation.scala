package graft.pipeline

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition every LLM pipeline
  * runs over raw text, built entirely from this engine's operators —
  * quality/language gate → exact dedup → near-dup clustering → keep one
  * canonical doc per cluster. Returns the curated corpus plus a funnel
  * report (rows surviving each stage) for observability.
  *
  * Scale shape: two linear scans (features, exact hash), the banded LSH
  * shuffle, and the component loop over the (tiny) near-dup edge list —
  * no stage is quadratic in the corpus.
  */
object Curation {

  final case class Config(
      minQuality: Double = 0.3,
      lang: String = "en",
      shingleWidth: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      nearDupThreshold: Double = 0.5)

  /** The quality + language gate (per-row, shuffle-free) — THE shared
    * Spark-side implementation of the `qualityGateSql` oracle fragment.
    * Every gated pipeline that filters on (quality, lang_pred) must go
    * through here so the formula/threshold can never silently diverge
    * between queries mirroring the same SQL. Appends the two gate
    * columns; callers project them away if unwanted. */
  def qualityLangGate(docs: DataFrame, minQuality: Double = 0.3,
      lang: String = "en", textCol: String = "text"): DataFrame =
    docs.withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextAnalysis.langIdHeuristic(col(textCol)))
      .filter(col("quality") >= minQuality && col("lang_pred") === lang)

  /** The gate's pass/fail PREDICATE as a single Column over the raw text —
    * the same quality/langid expressions [[qualityLangGate]] filters on,
    * usable inside a fused aggregation (conditional counts) where a filter
    * stage would force one job per funnel step. Pinned equal to
    * `qualityLangGate(df).count` in CurationSpec. */
  def gatePassPredicate(minQuality: Double = 0.3, lang: String = "en",
      textCol: String = "text"): org.apache.spark.sql.Column =
    TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
      TextAnalysis.langIdHeuristic(col(textCol)) === lang

  /** @param withFunnel false skips the per-stage counts (4 extra jobs) —
    *                    use for fire-and-forget runs where only the curated
    *                    output matters
    * @return (curated docs with quality metadata, stage → surviving rows;
    *         empty when withFunnel is false)
    * @note each call caches the exact-dedup survivors (and the LSH
    *       signature table inside the near-dup pass) until the returned
    *       plan is garbage-collected — repeated invocations in one session
    *       hold one cache per live plan */
  def curate(docs: DataFrame, cfg: Config = Config(),
      textCol: String = "text", idCol: String = "doc_id",
      withFunnel: Boolean = true): (DataFrame, Seq[(String, Long)]) = {
    val funnel = Seq.newBuilder[(String, Long)]

    // 1. quality + language gate (per-row, shuffle-free)
    val gated = qualityLangGate(docs, cfg.minQuality, cfg.lang, textCol)

    // FUSED funnel head (r16, guide §1.2 "don't compute things twice"):
    // input/gate/exact-survivor counts are conditional aggregates of ONE
    // corpus scan — the previous per-stage df.count() ran three jobs and
    // evaluated the (CPU-heavy) gate expressions twice. exact-survivor
    // count == countDistinct(md5(text)) over gate passers, because
    // exactDedup keeps exactly one row per md5(text) group (pinned in
    // CurationSpec).
    val nExact =
      if (!withFunnel) 0L
      else {
        val pass = gatePassPredicate(cfg.minQuality, cfg.lang, textCol)
        // two-level aggregation, not countDistinct: a mixed
        // distinct/non-distinct agg plans an Expand (2 copies of every
        // row); grouping by the dedup key first is one map-side-combined
        // shuffle of |vocab| keys and evaluates the gate once per row
        val r = docs
          .select(md5(col(textCol)).as("__k"), pass.cast("long").as("__p"))
          .groupBy(col("__k"))
          .agg(count(lit(1)).as("__c"), sum(col("__p")).as("__ps"))
          .agg(sum(col("__c")).as("n_input"), sum(col("__ps")).as("n_gate"),
            sum((col("__ps") > 0).cast("long")).as("n_exact")).head()
        funnel += "input" -> r.getLong(0)
        funnel += "quality_lang_gate" -> r.getLong(1)
        funnel += "exact_dedup" -> r.getLong(2)
        r.getLong(2)
      }

    // 2. exact dedup (one hash shuffle); cached once — the survivors feed
    // BOTH the LSH candidate pass and the final anti-join. persist (not
    // localCheckpoint): lazy, spillable, and the lineage survives executor
    // loss; freed by the ContextCleaner with the returned plan.
    val exact = Dedup.exactDedup(gated, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // survivor count for the near-dup pass's cost-based path choice: the
    // fused head already counted the survivors; without the funnel, a
    // bounded probe of the RAW input (upper bound of the survivors —
    // probing `exact` itself would force its window shuffle just to count)
    val survivorsHint =
      if (withFunnel) nExact
      else docs.select(col(idCol))
        .limit(Dedup.PrefilterMinDocs.toInt).count()

    // 3. near-dup pairs on the survivors (banded MinHash-LSH, verified),
    // plus the hot-bucket drop report off the same cached signature table
    val (pairs, dropStats) = Dedup.minHashLshNearDupPairsWithDrops(exact,
      textCol, idCol, cfg.shingleWidth, cfg.numHashes, cfg.bands,
      cfg.nearDupThreshold, docCountHint = survivorsHint)

    // 4. cluster and keep the canonical (min-id) member of each cluster
    val clusters = Dedup.connectedComponents(pairs)
    val dropIds = clusters.filter(col("id") =!= col("canonical")).select(col("id"))
    val curated = exact.join(dropIds, exact(idCol) === dropIds("id"), "left_anti")

    // 5. near-dup survivor count + IN-BAND drop accounting (r14) in ONE
    // job: every dropped id is a distinct exact-survivor id, so
    // |near_dup_dedup| = n_exact − |dropIds| (no anti-join recount), and
    // the drop stats ride the same aggregation pass over the (tiny)
    // cluster/drop tables. Zero drops in healthy corpora; a non-zero row
    // is the retune-the-cap alarm.
    if (withFunnel) {
      val nDropped = dropIds.count()
      funnel += "near_dup_dedup" -> (nExact - nDropped)
      val r = dropStats
        .agg(count(lit(1)).as("nb"), coalesce(sum(col("n_docs")), lit(0L)).as("nd"))
        .head()
      funnel += "lsh_dropped_buckets" -> r.getLong(0)
      funnel += "lsh_dropped_docs" -> r.getLong(1)
    }

    (curated, funnel.result())
  }
}
