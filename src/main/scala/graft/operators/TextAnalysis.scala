package graft.operators

import graft.core.Fixtures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM-pipeline curation (north-star
  * extensions): token counting, quality scoring, language-ID heuristic,
  * document fingerprinting. All built from codegen'd string/array
  * functions — per-row, embarrassingly parallel, no shuffle until the
  * (optional) final aggregation, so they stream over 100 TB of text.
  */
object TextAnalysis {

  /** Whitespace tokens (fixture text is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** One-pass [n_chars, n_words, n_stopwords] — the codegen'd kernel every
    * gate statistic below derives from (r17, guide §4): the old
    * `filter(words, _.isInCollection(stops))` form was a CodegenFallback
    * that dropped the whole gate projection out of whole-stage codegen and
    * re-ran `split()` per derived column. Identical values are pinned by
    * TextGateStatsSpec; repeated uses in one projection collapse via
    * Spark's common-subexpression elimination. */
  private def gateStats(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.TextGateStats(
      ColumnBridge.expression(text), Fixtures.Stopwords))
  }

  /** INT like the original `size(split(...))` form — several gated queries
    * emit these as output columns, so the type is part of the oracle
    * schema contract. */
  def nWords(text: Column): Column = gateStats(text).getItem(1).cast("int")

  /** Count of stopword tokens — the basis of the language-ID heuristic.
    * (Non-default stop lists keep the generic split/filter form.) */
  def nStopwords(text: Column, stops: Seq[String] = Fixtures.Stopwords): Column =
    if (stops == Fixtures.Stopwords) gateStats(text).getItem(2).cast("int")
    else size(filter(words(text), w => w.isInCollection(stops)))

  def stopwordRatio(text: Column): Column =
    nStopwords(text).cast("double") / nWords(text).cast("double")

  /** BPE-ish token estimate: whitespace tokens + ceil(chars/4) blended —
    * the standard "~4 chars per token" heuristic, deterministic. */
  def tokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / lit(4.0)).cast("long")

  /** BPE-ish regex token split: letter runs, digit runs, and single
    * non-space symbols — the shape of a byte-pair pre-tokenizer's coarse
    * split (identical semantics in Java regex and DuckDB RE2 for these
    * classes). */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountRegex(text: Column): Column = regexp_count(text, lit(TokenRegex))

  /** Mean word length (chars excluding separators / word count). */
  def avgWordLen(text: Column): Column =
    (length(text) - (nWords(text) - lit(1))).cast("double") / nWords(text).cast("double")

  /** Quality score in [0,1]: blend of length saturation, stopword presence
    * and word-length sanity — a deterministic stand-in for a trained
    * classifier. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(10.0), lit(1.0))
    val wlen = avgWordLen(text)
    val wlenScore = when(wlen >= 3.0 && wlen <= 8.0, lit(1.0)).otherwise(lit(0.5))
    (lenScore + stopScore + wlenScore) / lit(3.0)
  }

  /** [[qualityScore]] quantized to `decimals` places as an EXACT scaled
    * integer (units of 10^-decimals), half-up. Every component of the
    * score is a ratio of integer counts, so the score is the exact
    * rational num / (3000·nw) with
    * `num = 2·nw·min(len,500) + 1000·min(10·ns, nw) + (1000|500)·nw`;
    * quantization is then one BIGINT floor-division — bit-identical in
    * any engine, unlike `round(double, d)` whose half-tie handling
    * differs between Spark (BigDecimal-of-shortest-repr HALF_UP) and
    * DuckDB (scale-and-rint). Use THIS wherever a quantized quality
    * score feeds an order-by boundary or a join/group key.
    * `decimals` ∈ [3, 9] (the 10^decimals/1000 reduction keeps the
    * numerator far inside BIGINT). */
  def qualityScoreScaled(text: Column, decimals: Int): Column = {
    require(decimals >= 3 && decimals <= 9, s"decimals in [3,9], got $decimals")
    val p = math.pow(10, decimals - 3).toLong // 10^d / 1000, exact
    val len = length(text).cast("long")
    val nw = nWords(text).cast("long")
    val ns = nStopwords(text).cast("long")
    val chars = len - nw + lit(1L) // total word chars; awl = chars/nw
    val w = when(chars >= nw * 3L && chars <= nw * 8L, lit(1000L)).otherwise(lit(500L))
    val num = least(len, lit(500L)) * lit(2L) * nw +
      least(ns * lit(10L), nw) * lit(1000L) + w * nw
    // half-up: floor((2·num·p + 3·nw) div (6·nw)), pure BIGINT division
    // (all terms non-negative, so truncating div ≡ floor div)
    graft.functions.IntMath.intDiv(
      (num * lit(2L * p) + nw * lit(3L)).cast("long"),
      (nw * lit(6L)).cast("long"))
  }

  /** PII patterns shared verbatim with the oracle SQL — restricted to the
    * Java-regex ∩ RE2 common subset (character classes, bounded repeats,
    * ASCII `\b`; no lookaround), so both engines match identically.
    * Order matters: emails are redacted FIRST so an IP-shaped mail domain
    * can't double-count. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhone = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val PiiIp = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction — the privacy-scrub pass every training-data pipeline
    * runs before packing: emails, phone numbers and IPv4 literals are
    * counted and replaced with typed sentinels (`<EMAIL>`/`<PHONE>`/
    * `<IP>`), SEQUENTIALLY (each count runs on the previous stage's
    * redacted text, so one span is attributed to exactly one type).
    * Adds `n_email`, `n_phone`, `n_ip` and `redacted`. Pure per-row
    * codegen'd regex work — zero shuffles, streams over 100 TB. */
  def piiRedact(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_email", regexp_count(col(textCol), lit(PiiEmail)).cast("long"))
      .withColumn("__t1", regexp_replace(col(textCol), PiiEmail, "<EMAIL>"))
      .withColumn("n_phone", regexp_count(col("__t1"), lit(PiiPhone)).cast("long"))
      .withColumn("__t2", regexp_replace(col("__t1"), PiiPhone, "<PHONE>"))
      .withColumn("n_ip", regexp_count(col("__t2"), lit(PiiIp)).cast("long"))
      .withColumn("redacted", regexp_replace(col("__t2"), PiiIp, "<IP>"))
      .drop("__t1", "__t2")

  /** Per-source PII EXPOSURE report over [[piiRedact]]'s output — the
    * governance rollup next to the redaction pass itself: how many docs in
    * each source carry each PII class (and any class at all), alongside
    * total occurrences. One map-side-combinable aggregation on the same
    * single pattern set ([[PiiEmail]]/[[PiiPhone]]/[[PiiIp]]) — no second
    * regex table to drift. The rate divides two exact longs, so both
    * engines produce the identical IEEE double. */
  def piiReport(redacted: DataFrame, groupCol: String): DataFrame =
    redacted.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("n_email") > 0).cast("long")).as("docs_email"),
        sum((col("n_phone") > 0).cast("long")).as("docs_phone"),
        sum((col("n_ip") > 0).cast("long")).as("docs_ip"),
        sum((col("n_email") + col("n_phone") + col("n_ip") > 0).cast("long"))
          .as("docs_any"),
        sum(col("n_email")).as("occ_email"),
        sum(col("n_phone")).as("occ_phone"),
        sum(col("n_ip")).as("occ_ip"))
      .withColumn("pii_doc_rate",
        col("docs_any").cast("double") / col("n_docs").cast("double"))

  /** n-gram-free language-ID heuristic: English stopword density. The
    * fixture corpus is synthetic, so this pins the OPERATOR (deterministic
    * classification), not linguistic accuracy. */
  def langIdHeuristic(text: Column): Column =
    when(stopwordRatio(text) >= 0.05, lit("en")).otherwise(lit("other"))

  /** Content fingerprint: md5 of the lowercased text — used for exact-dup
    * detection robust to case. A rolling/winnowing variant can be layered
    * on the shingle machinery in [[Dedup.shingles]]. */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** Ordered (non-distinct) word k-shingle 32-bit hashes of a document —
    * the input sequence for winnowing. */
  private def shingleHashes(text: Column, k: Int): Column = {
    val ws = words(text)
    filter(
      transform(sequence(lit(0), greatest(size(ws) - k, lit(0))),
        i => when(size(ws) >= k,
          conv(substring(md5(concat_ws(" ", slice(ws, i + 1, lit(k)))), 1, 8), 16, 10)
            .cast("long"))),
      h => h.isNotNull)
  }

  /** Winnowing document fingerprints (rolling-hash selection, Schleimer et
    * al. MOSS): hash every ordered k-shingle, slide a window of `win`
    * consecutive hashes, keep each window's minimum, distinct. Any shared
    * run of `win + k - 1` words between two documents shares a fingerprint.
    * Emitted as (id, fp) rows — per-row, shuffle-free until the caller
    * groups or joins on fp, so it streams over 100 TB of text. */
  def winnowFingerprints(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 4, win: Int = 5): DataFrame = {
    // Bind the (md5-heavy) shingle-hash array ONCE per row as a lambda
    // variable. Referencing it as a plain sub-expression would let
    // CollapseProject inline it into every window slice — O(windows)
    // md5 recomputation per row (measured 20× slower at sf0.1).
    val fps = element_at(
      transform(array(shingleHashes(col(textCol), k)), hs => {
        val m = size(hs)
        when(m >= win,
          array_distinct(transform(sequence(lit(0), greatest(m - win, lit(0))),
            j => array_min(slice(hs, j + 1, lit(win))))))
        .when(m > 0, array(array_min(hs)))
        .otherwise(array().cast("array<bigint>"))
      }), 1)
    docs.select(col(idCol), explode(fps).as("fp"))
  }

  /** Gopher-style repetition signals (the "repetitious text" family of
    * quality filters): duplicate-word fraction and the share of bigram
    * slots taken by the single most frequent word bigram. High values flag
    * boilerplate / degenerate documents for the curation gate.
    *
    * Entirely per-row (sort the row's bigrams, take the longest equal run
    * with one `aggregate` pass) — ZERO shuffles, unlike the textbook
    * explode→groupBy(doc, gram)→groupBy(doc) formulation, which shuffles
    * the whole exploded corpus twice. A per-document statistic should
    * never leave its row at 100 TB. */
  def repetitionSignals(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ws = docs.select(col(idCol), words(col(textCol)).as("w"))
    ws.select(col(idCol), size(col("w")).as("nw"),
        size(array_distinct(col("w"))).as("ndw"),
        when(size(col("w")) >= 2, maxBigramRun(col("w"))).otherwise(lit(0L)).as("max2"))
      .select(col(idCol), col("nw").as("n_words"),
        ((col("nw") - col("ndw")).cast("double") / col("nw").cast("double"))
          .as("dup_word_frac"),
        when(col("nw") >= 2, col("max2").cast("double") / (col("nw") - 1).cast("double"))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Max word-bigram multiplicity of the word array `w`, computed per-row
    * with no shuffle: bigram i = w[i]+" "+w[i+1]; sort the bigrams, then
    * the longest run of equal adjacent values (one `aggregate` pass —
    * state: last value, current run, best run) equals the max count.
    * Callers guard `size(w) >= 2` (no bigrams otherwise). */
  private def maxBigramRun(w: Column): Column = {
    val sortedGrams = array_sort(transform(sequence(lit(1), size(w) - 1),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
    aggregate(sortedGrams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  /** The repetition arm of the Gopher rule family (Rae et al. 2021 App.
    * A1's "repetitious text" filters), integer cross-multiplied like
    * [[gopherRules]]: duplicate-word fraction ≤ 30% → (nw−ndw)·10 ≤ nw·3;
    * top-bigram share ≤ 20% → max2·5 ≤ nw−1. Emits the raw counts and the
    * per-rule booleans for the rejection-rate data card. Same per-row
    * zero-shuffle shape as [[repetitionSignals]] — a per-document
    * statistic never leaves its row at 100 TB. */
  def gopherRepetitionRules(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ws = docs.select(col(idCol), words(col(textCol)).as("w"))
    val sig = ws.select(col(idCol), size(col("w")).as("n_words"),
      (size(col("w")) - size(array_distinct(col("w")))).as("n_dup_words"),
      when(size(col("w")) >= 2, maxBigramRun(col("w"))).otherwise(lit(0L))
        .as("max_bigram_count"))
    val rDup = sig("n_dup_words") * lit(10) <= sig("n_words") * lit(3)
    val rTop = sig("max_bigram_count") * lit(5) <= (sig("n_words") - 1).cast("long")
    sig.select(col(idCol), col("n_words"), col("n_dup_words"),
      col("max_bigram_count"), rDup.as("r_dup_words"), rTop.as("r_top_bigram"),
      (rDup && rTop).as("keep"))
  }

  /** Gopher-style per-document quality rule gate (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from Training
    * Gopher", App. A1 — word-count bounds, mean-word-length bounds,
    * stop-word presence, repetition), adapted to the fixture corpus's
    * signal ranges. Every rule is an INTEGER comparison (ratios cross-
    * multiplied: stop/words ≥ 2% becomes `n_stop·50 ≥ n_words`), so the
    * flags replay bit-exactly in any engine — no float thresholds to
    * diverge on. One projection per row, zero shuffle at any corpus size:
    * the filter gate of a 100 TB curation pass is map-side by design.
    * Emits the per-rule booleans (not just the conjunction) because a
    * production pipeline reports per-rule rejection rates (the data card),
    * not a single opaque keep bit. */
  def gopherRules(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minWords: Int = 20, maxWords: Int = 80): DataFrame = {
    val (nw, nstop, ndist, rWc, rMwl, rStop, rDist) =
      gopherParts(col(textCol), minWords, maxWords)
    docs.select(col(idCol),
      nw.as("n_words"), nstop.as("n_stop"), ndist.as("n_distinct"),
      rWc.as("r_word_count"), rMwl.as("r_mean_word_len"),
      rStop.as("r_stopwords"), rDist.as("r_distinct"),
      (rWc && rMwl && rStop && rDist).as("keep"))
  }

  /** The [[gopherRules]] conjunction as a single map-side predicate — the
    * form a pipeline's filter stage wants (no flag projection, pushable
    * straight into the scan). */
  def gopherKeep(text: Column, minWords: Int = 20, maxWords: Int = 80): Column = {
    val (_, _, _, rWc, rMwl, rStop, rDist) = gopherParts(text, minWords, maxWords)
    rWc && rMwl && rStop && rDist
  }

  private def gopherParts(text: Column, minWords: Int, maxWords: Int) = {
    val w = words(text)
    val nw = size(w)
    // chars inside words: total minus the nw-1 single-space separators
    val chars = length(text) - nw + lit(1)
    val nstop = nStopwords(text)
    val ndist = size(array_distinct(w))
    (nw, nstop, ndist,
      nw >= minWords && nw <= maxWords,
      chars >= nw * lit(3) && chars <= nw * lit(8),
      nstop * lit(50) >= nw,
      ndist * lit(2) >= nw)
  }

  /** fastText-shaped hashed linear classifier score: Σ over tokens of an
    * integer weight w(token) = (md5_32(token) mod 21) − 10 ∈ [−10, 10] — a
    * deterministic stand-in for trained weights (a real model drops its
    * weight table into the same hash-lookup slot). Exact integer sum via a
    * single per-row `aggregate` over the token array — ZERO shuffles, like
    * [[repetitionSignals]]; the only float op is one final division. */
  def classifierRawScore(text: Column): Column =
    aggregate(
      transform(words(text), w => pmod(Dedup.md5Int32(w), lit(21L)) - lit(10L)),
      lit(0L), (acc, x) => acc + x)

  /** Top-`v` corpus vocabulary by term frequency (ties broken by term) —
    * the dictionary side of OOV-rate scoring. One explode + one
    * map-side-combinable count + a top-v (TakeOrderedAndProject). */
  def topVocab(docs: DataFrame, textCol: String = "text", v: Int = 200): DataFrame =
    docs.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(v)

  /** Out-of-vocabulary rate per doc against [[topVocab]]: the classic
    * "gibberish detector" quality signal. The vocab (≤ v rows) broadcasts;
    * the token stream never shuffles except the per-doc count. */
  def oovRate(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      v: Int = 200): DataFrame = {
    val vocab = topVocab(docs, textCol, v).select(col("w").as("vw"))
    docs.select(col(idCol), explode(words(col(textCol))).as("w"))
      .join(broadcast(vocab), col("w") === col("vw"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("vw").isNull, 1)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))
  }

  /** Per-document feature table. */
  def docFeatures(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      nWords(col(textCol)).as("n_words"),
      length(col(textCol)).as("n_chars"),
      tokenEstimate(col(textCol)).as("n_tokens_est"),
      tokenCountRegex(col(textCol)).as("n_tokens_re"),
      nStopwords(col(textCol)).as("n_stopwords"),
      langIdHeuristic(col(textCol)).as("lang_pred"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** Inverted-index postings for the corpus: (w, df, doc_ids) per word
    * with document frequency ≥ `minDf` — the lexical-retrieval index
    * structure (the text sibling of the Grid cell index). One explode +
    * one per-word aggregation; posting lists sort AFTER collection
    * (collect_set order is partition-dependent, array_sort restores the
    * deterministic contract). At 100 TB, high-df words are the skew risk —
    * cap or tier them the way `Freq` heavy-hitters are handled. */
  def invertedPostings(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minDf: Int = 2): DataFrame =
    docs.select(col(idCol), explode(array_distinct(words(col(textCol)))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("df"),
        array_sort(collect_set(col(idCol))).as("doc_ids"))
      .filter(col("df") >= minDf)

  /** Okapi BM25 top-k for a fixed bag of query terms. Corpus statistics
    * (N, avgdl, per-term df) reduce to scalars/tiny tables; scoring is a
    * single pass over the corpus — per-term tf via a codegen'd array
    * filter, the k1/b saturation formula in fixed term order (so IEEE
    * addition associates identically in the DuckDB oracle), then a
    * distributed top-k. Scores are rounded to 6 decimals BEFORE ranking so
    * sub-ulp ln() differences between engines cannot flip the order
    * (doc_id breaks residual ties). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ws = words(col(textCol))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(nWords(col(textCol)).cast("long")).cast("double") /
        count(lit(1))).as("avgdl"))
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(ws, t), 1L).otherwise(0L)).as(s"df_$i")
    }
    val dfAgg = docs.agg(dfCols.head, dfCols.tail: _*)
    val scored = docs
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(dfAgg))
      .withColumn("dl", nWords(col(textCol)).cast("double"))
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(ws, w => w === t)).cast("double")
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    scored
      .select(col(idCol), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol).asc)
      .limit(k)
  }

  /** Corpus-level boilerplate-segment removal (the C4/RefinedWeb "remove
    * lines repeated across documents" cleaning stage, re-expressed over
    * word segments since the fixture has no newline structure): cut each
    * doc into non-overlapping `width`-word segments (a short final
    * remainder is a segment too), drop every segment appearing in at least
    * `minDocs` DISTINCT documents, and reconstruct the remaining text in
    * position order.
    *
    * Scale shape: one explode + one distinct-count aggregation finds the
    * (small) boilerplate dictionary; the removal join is an anti join the
    * optimizer broadcasts; reconstruction re-aggregates per doc with an
    * explicit position sort inside the collected array (collect_list order
    * is partition-dependent).
    *
    * Returns (doc_id, n_segments, n_removed, clean_text) — docs whose
    * every segment was boilerplate come back with empty text, not dropped. */
  def boilerplateRemove(docs: DataFrame, width: Int = 3, minDocs: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val ws = words(col(textCol))
    val nseg = ceil(size(ws).cast("double") / width).cast("int")
    val segs = docs
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), nseg - 1),
          i => concat_ws(" ", slice(ws, i * width + 1, lit(width))))))
      .withColumnRenamed("pos", "seg_pos").withColumnRenamed("col", "seg")
    val common = segs.groupBy(col("seg"))
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("seg"))
    val kept = segs.join(common, Seq("seg"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("seg_pos"), col("seg")))),
            s => s.getField("seg"))).as("clean_text"))
    docs.select(col(idCol), nseg.as("n_segments"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_segments"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L))).cast("long").as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** ln() quantized to 9 decimals and carried as an exact decimal — the
    * engine-exact log-arithmetic building block (same contract as the
    * bigram-LM / Naive-Bayes log terms). */
  private def q9ln(c: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    round(log(c.cast("double")), 9).cast(DecimalType(18, 9))
  }

  /** Bigram collocations ranked by pointwise mutual information —
    * PMI(x,y) = ln(p(x,y) / (p(x)p(y))) over the corpus token stream, the
    * classic collocation-extraction statistic (Church & Hanks 1990).
    *
    * Scale shape: the bigram explode is per-row; bigram and unigram counts
    * are each ONE key-local aggregation; the two totals reduce to a 1-row
    * broadcast; the count-table joins are |vocab|-sized hash joins, never
    * corpus-sized. All five ln terms are 9-decimal-quantized and combined
    * in exact decimal arithmetic, so the ranking (and the values) replay
    * bit-for-bit in the oracle. */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5, k: Int = 20,
      textCol: String = "text"): DataFrame = {
    val base = docs.select(words(col(textCol)).as("w"))
    val grams = base.filter(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("w")) - 2),
        i => struct(element_at(col("w"), i + 1).as("x"),
          element_at(col("w"), i + 2).as("y")))).as("g"))
      .select(col("g.x").as("x"), col("g.y").as("y"))
    val uni = base.select(explode(col("w")).as("t"))
    val cxy = grams.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
    val cx = uni.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(count(lit(1)).as("nuni"))
      .crossJoin(grams.agg(count(lit(1)).as("nbi")))
    cxy.filter(col("n") >= minCount)
      .join(cx.select(col("t").as("x"), col("c").as("cxc")), Seq("x"))
      .join(cx.select(col("t").as("y"), col("c").as("cyc")), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("pmi",
        (q9ln(col("n")) - q9ln(col("nbi")) - q9ln(col("cxc")) -
          q9ln(col("cyc")) + q9ln(col("nuni")) + q9ln(col("nuni")))
          .cast("double"))
      .select(col("x"), col("y"), col("n"), col("pmi"))
      .orderBy(col("pmi").desc, col("x"), col("y"))
      .limit(k)
  }

  /** The 26 lowercase letters — the alphabet of [[letterEntropy]]. */
  val Letters: Seq[String] = ('a' to 'z').map(_.toString)

  /** Per-document Shannon entropy of the letter distribution — the
    * Gopher-family "natural text has ~4.1 bits/letter-ish entropy" quality
    * signal; gibberish and single-char spam score near 0, keyboard mash
    * scores near ln(26).
    *
    * Scale shape: letter counts come from ONE codegen'd byte-scan per row
    * ([[graft.functions.LetterHistogram]] — NO explode, ZERO shuffles; the
    * whole operator streams). H = ln(n) − (Σ cᵢ·ln cᵢ)/n with each ln
    * 9-decimal-quantized and the weighted sum kept in exact decimals
    * (per-step re-cast to DECIMAL(29,9) so Spark's precision promotion
    * never silently drops the 9th decimal), then ONE double division —
    * engine-exact vs the oracle's `replace`-count formulation on ASCII. */
  def letterEntropy(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val hist = toCol(graft.functions.LetterHistogram(toExpr(col(textCol))))
    // per-row folds over the 26-slot histogram as higher-order `aggregate`s
    // — a 26-term unrolled decimal expression tree made Catalyst's
    // analyze/optimize/codegen pass the dominant cost (~3s per plan); the
    // HOF form keeps the tree constant-size with identical exact-decimal
    // semantics (per-step DECIMAL(29,9) re-cast)
    val dec0 = lit(0).cast(DecimalType(29, 9))
    val n = aggregate(col("h"), lit(0L), (acc, c) => acc + c)
    val s = aggregate(col("h"), dec0, (acc, c) =>
      (acc + when(c > lit(0L),
        (c.cast(DecimalType(10, 0)) * q9ln(c)).cast(DecimalType(29, 9)))
        .otherwise(dec0)).cast(DecimalType(29, 9)))
    val hn = (col("n_letters").cast(DecimalType(10, 0)) *
      q9ln(col("n_letters"))).cast(DecimalType(29, 9)) - s
    docs.select(col(idCol), hist.as("h"))
      .select(col(idCol), col("h"), n.as("n_letters"))
      .select(col(idCol), col("n_letters"),
        (hn.cast("double") / col("n_letters").cast("double")).as("entropy"))
      .filter(col("n_letters") >= 1)
  }

  /** Corpus n-gram diversity per group: distinct word n-grams over total
    * n-gram occurrences — the type/token ratio at n-gram granularity, the
    * corpus-health statistic that drops when a crawl is template-heavy or
    * a generator loops (the corpus-level sibling of the per-doc
    * repetition signals). Total occurrences need NO explode — each doc
    * contributes max(words − n + 1, 0), a per-row expression summed
    * map-side; only the DISTINCT count walks exploded grams (per-doc
    * distinct first via [[Dedup.shingles]], so the explode carries each
    * doc's gram SET, then one distinct-aggregate per group — the same two
    * shuffle-light passes at any corpus size). */
  def ngramDiversity(docs: DataFrame, n: Int, groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val totals = docs.groupBy(col(groupCol))
      .agg(sum(greatest(nWords(col(textCol)) - (n - 1), lit(0)).cast("long"))
        .as("n_grams"))
    val distincts = docs
      .select(col(groupCol), explode(Dedup.shingles(col(textCol), n)).as("g"))
      .groupBy(col(groupCol))
      .agg(count_distinct(col("g")).as("n_distinct"))
    totals.join(distincts, Seq(groupCol))
      .select(col(groupCol), col("n_grams"), col("n_distinct"),
        when(col("n_grams") > 0,
          col("n_distinct").cast("double") / col("n_grams").cast("double"))
          .as("diversity"))
  }

  /** T5/UL2-style span-corruption prep: deterministically mask ~1/maskMod
    * of each document's tokens (md5 of doc_id:pos — RNG-free, so the
    * (input, target) pair set is reproducible across runs and engines),
    * collapse each CONSECUTIVE masked run into one numbered sentinel
    * `<extra_id_k>` in the input, and emit the masked spans prefixed by
    * their sentinel as the target — the denoising-objective example
    * construction of T5 pretraining (span corruption), as a corpus job.
    *
    * Scale shape: one token explode, ONE (doc, pos) shuffle shared by
    * both windows (run detection + numbering), one per-doc re-aggregation
    * with an explicit position sort inside the collected array; nothing
    * global, so it streams over any corpus size.
    *
    * Returns (doc_id, input_text, target_text, n_spans, n_masked). Docs
    * with no masked token keep their full text and an empty target. */
  def spanCorrupt(docs: DataFrame, maskMod: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol),
      posexplode(words(col(textCol))).as(Seq("pos", "word")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = toks
      .withColumn("m",
        Dedup.md5Int32(concat(col(idCol).cast("string"), lit(":"),
          col("pos").cast("string"))) % maskMod === 0)
      .withColumn("run_start",
        col("m") && !coalesce(lag(col("m"), 1).over(w), lit(false)))
      .withColumn("k", sum(col("run_start").cast("int")).over(running))
    val sentinel = concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))
    val pieceIn = when(!col("m"), col("word"))
      .when(col("run_start"), sentinel)
    val pieceTgt = when(col("run_start"), concat(sentinel, lit(" "), col("word")))
      .when(col("m"), col("word"))
    flagged.groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), pieceIn.as("p")))),
          s => s.getField("p"))).as("input_text"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), pieceTgt.as("p")))),
          s => s.getField("p"))).as("target_text"),
        sum(col("run_start").cast("int")).cast("long").as("n_spans"),
        sum(col("m").cast("int")).cast("long").as("n_masked"))
  }
}
