package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-governance operators: the per-source/per-language policy layer a
  * multi-dump training-data pipeline runs AFTER scoring and dedup — caps,
  * priority resolution across sources, and cross-group score calibration.
  * The reference has no multi-tenant corpus notion (one in-memory table,
  * vectordb/database.py); these generalize its single-collection model to
  * the many-sources corpus a 100 TB crawl actually is.
  */
object Governance {

  /** Keep at most `n` rows per `key`, chosen by `ordering` (must be a
    * TOTAL order for determinism — tie-break on a unique id). The
    * Common-Crawl-style per-host/per-source cap that stops any one
    * domain from dominating the mixture.
    *
    * Scale shape: `row_number <= n` over a per-key window is planned by
    * Spark as `WindowGroupLimitExec` — each map task keeps only its local
    * top-n per key BEFORE the shuffle, so the exchange carries at most
    * n·keys·tasks rows, not the corpus. No collect, no skew trap for
    * small n.
    */
  def capPerKey(df: DataFrame, key: String, n: Int, ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(ordering: _*)
    df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= n)
      .drop("__rnk")
  }

  /** Fractional-epoch upsampling — the training-mixture "see this source
    * 2.5 times" materializer: every row is replicated ⌊rate⌋ times, plus
    * once more for the deterministic hash-selected `frac(rate)` share of
    * ids (id-hash mod 100 < the rate's cents digit pair), so a 2.5-epoch
    * source contributes each row twice and half its rows a third time —
    * the realized copy count converges to rate·n with NO randomness
    * (replayable across engines and across runs, unlike Poisson
    * resampling). Emits one output row per copy with `copy_idx` ∈
    * [1, n_copies]. Rates BELOW 1.0 degrade gracefully to deterministic
    * Bernoulli DOWN-sampling (⌊rate⌋ = 0, so only the hash-selected
    * fraction keeps its single copy) — one operator covers the whole
    * mixture-rate axis.
    *
    * Scale shape: pure map-side — hash, `sequence`, `explode`; no
    * shuffle, no state. Output volume is rate·|input| by construction;
    * at 100 TB the explode happens AFTER column pruning so only the
    * training payload is replicated. Rates are read at 2-decimal
    * precision (integer cents arithmetic — exact in any engine). */
  def epochUpsample(df: DataFrame, idCol: Column,
      rateCol: Column): DataFrame = {
    val cents = round(rateCol.cast("double") * lit(100.0), 0).cast("long")
    val base = (cents / 100L).cast("long") // integral division floors: cents ≥ 0
    val fracCents = pmod(cents, lit(100L))
    val extra = (pmod(graft.operators.Dedup.md5Int32(idCol.cast("string")),
      lit(100L)) < fracCents).cast("long")
    df.withColumn("__n_copies", (base + extra).cast("int"))
      .filter(col("__n_copies") >= 1)
      .withColumn("copy_idx",
        explode(sequence(lit(1), col("__n_copies"))))
      .drop("__n_copies")
  }

  /** Deterministic sharded epoch shuffle — the global random permutation a
    * training run wants, re-expressed as the shape a cluster can actually
    * execute: shard = md5(seed‖id) mod nShards, then a per-shard position
    * by the same hash (tie-broken on id, so the order is TOTAL and
    * replayable). Reading shards in order, positions within each shard in
    * order, visits the corpus in a seed-keyed pseudo-random permutation;
    * changing `seed` reshuffles every epoch with zero state carried
    * between epochs (no RNG to checkpoint, any row's position is
    * recomputable from (seed, id) alone — the property that makes mid-
    * epoch restart cheap).
    *
    * Scale shape: one hash-partitioned exchange on `shard` + a per-shard
    * sort — Spark's `row_number` over a PARTITIONED window, never the
    * single-partition global-window cliff. Each shard holds ~|corpus|/
    * nShards rows; at 100 TB pick nShards so a shard fits an executor's
    * sort budget (the same dial as shuffle partitions) — the plan shape
    * is independent of corpus size. */
  /** Count-derived shard count for [[epochShuffle]]: ⌈n / targetShardSize⌉
    * — the same scale knob every size-dependent operator here derives from
    * a count instead of pinning (a pinned nShards makes the per-shard
    * window O(corpus/nShards) rows per partition: fine at 10^5 rows, a
    * skew cliff at 10^9). The default target keeps the 500-doc fixture at
    * its historical 8 shards (500/64 → 8), so sf0.01 hashes are stable. */
  def shardCountFor(n: Long, targetShardSize: Long = 64L): Int = {
    require(n >= 0 && targetShardSize > 0)
    math.max(1L, (n + targetShardSize - 1) / targetShardSize)
      .min(Int.MaxValue.toLong).toInt
  }

  def epochShuffle(df: DataFrame, idCol: Column, seed: Int,
      nShards: Int): DataFrame = {
    // fail loudly instead of silently replacing a caller's column —
    // "shard"/"pos" are plausible user names on a training-mix frame
    Seq("shard", "pos", "__h").foreach(c =>
      require(!df.columns.contains(c),
        s"epochShuffle would overwrite existing column '$c'"))
    val h = graft.operators.Dedup.md5Int32(
      concat_ws(":", lit(seed), idCol.cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), idCol)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** Shard-export integrity manifest — the publishing step after
    * [[epochShuffle]]: per shard, the row count, token mass, and an
    * ORDER-SENSITIVE content digest (md5 over the shard's doc ids in
    * position order). This is what a training-data exporter writes next
    * to its shard files so a consumer can verify a shard was neither
    * truncated nor re-ordered (position order matters: the epoch order IS
    * the training order). Every column is a pure function of (seed, ids),
    * so the whole manifest replays in SQL.
    *
    * Scale: one shard-keyed aggregation; the per-shard id list is bounded
    * by the target shard size (the [[shardCountFor]] knob), never the
    * corpus. Input must carry [[epochShuffle]]'s (shard, pos) columns. */
  def shardManifest(shuffled: DataFrame, idCol: Column,
      tokensCol: Column): DataFrame =
    shuffled.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokensCol).as("n_tokens"),
        md5(concat_ws(",",
          transform(
            sort_array(collect_list(struct(col("pos"), idCol.as("__id")))),
            x => x.getField("__id").cast("string")))).as("content_digest"))

  /** Exact-duplicate resolution across sources by PRIORITY, not first-id:
    * within each content-digest group the survivor is the row with the
    * smallest (priority, id) — "when the same document appears in the
    * curated dump and the raw crawl, keep the curated copy". Emits every
    * row with its group's digest, size, survivor flag and the id it lost
    * to — the audit columns a provenance-tracked dedup keeps.
    *
    * One shuffle on the digest; the per-group window sees only duplicate
    * group members (group size is bounded by the dup rate, not the
    * corpus).
    */
  def priorityDedup(df: DataFrame, textCol: String, idCol: String,
      priorityCol: Column): DataFrame = {
    val digest = md5(col(textCol))
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(priorityCol.asc, col(idCol).asc)
    df.withColumn("content_hash", digest)
      .withColumn("group_size", count(lit(1)).over(
        Window.partitionBy(col("content_hash"))))
      .withColumn("kept_id", first(col(idCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("is_kept", (col(idCol) === col("kept_id")).cast("int"))
  }

  /** Per-group percentile normalization of a score column — the
    * cross-language calibration step: a raw quality score is only
    * comparable WITHIN a language, so gates are set on the per-language
    * percentile, not the raw value. `pctl` is the fraction of the group's
    * rows with a STRICTLY smaller score, i.e. SQL `percent_rank()` over
    * (group, score) ties included: (rows below) / (n - 1).
    *
    * Scale shape: NOT a row-level window (a per-language sort of the
    * corpus). The caller passes an already-QUANTIZED score (`scoreQ`);
    * the corpus collapses to a per-(group, score) HISTOGRAM, the running
    * below-count runs over |group × distinct quantized score| histogram
    * rows, and the percentile joins back by (group, score) — the same
    * collapse rank_auc_classifier uses. The quantization scale is the
    * knob that bounds the histogram (4 decimals → ≤ 10^4 buckets per
    * group for a [0,1] score, broadcast-sized at any corpus size; finer
    * scales trade histogram size for resolution). The quantized score is
    * also the join key, so the mapping is exact — no double-equality
    * join hazard.
    */
  def percentileByGroup(df: DataFrame, group: String, scoreQ: Column): DataFrame = {
    val scored = df.withColumn("__q", scoreQ)
    val hist = scored.groupBy(col(group), col("__q"))
      .agg(count(lit(1)).as("__c"))
    val below = Window.partitionBy(col(group)).orderBy(col("__q").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = Window.partitionBy(col(group))
    val pr = hist
      .withColumn("__below", coalesce(sum(col("__c")).over(below), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(tot))
      .withColumn("pctl",
        when(col("__n") > 1,
          round(col("__below").cast("double") / (col("__n") - 1).cast("double"), 9))
          .otherwise(lit(0.0)))
      .select(col(group), col("__q"), col("pctl"),
        col("__below").as("pct_below"), col("__n").as("pct_n"))
    scored.join(broadcast(pr), Seq(group, "__q"))
      .withColumnRenamed("__q", "score_q")
  }

  /** Exact percent-rank in nano-units (10^-9), half-up, from
    * [[percentileByGroup]]'s `pct_below`/`pct_n` integers — one BIGINT
    * floor-division, bit-identical in any engine (the rounded-double
    * `pctl` can flip a half-tie between engines; this cannot). */
  def pctlNanos(below: Column, n: Column): Column =
    when(n > 1,
      graft.functions.IntMath.intDiv(
        below * lit(2000000000L) + (n - lit(1L)),
        (n - lit(1L)) * lit(2L)))
      .otherwise(lit(0L))

  /** Quantile normalization across groups — the batch-effect correction
    * transform: each row's score is replaced by the POOLED distribution's
    * value at the row's within-group percentile, qnorm(x) =
    * Q_pooled(F_group(x)), so every group's marginal distribution maps
    * onto the shared one (sources with inflated or deflated score scales
    * become comparable; the parametric z-score assumes a shape, the
    * percentile stops at ranks — this rebuilds actual pooled VALUES).
    *
    * Scale shape: [[percentileByGroup]]'s histogram collapse supplies the
    * within-group percentile; the pooled side is one more bounded
    * histogram with cumulative rank ranges. The inverse-CDF lookup
    * Q_pooled(p) interpolates between the pooled values at ranks
    * ⌊p·(N−1)⌋ and ⌈p·(N−1)⌉, found by joining the rank into the
    * histogram's [cum_start, cum_end) ranges — two broadcast range joins
    * against a ≤|distinct quantized score| table, never a sort of the
    * corpus. Interpolation runs in double and rounds to 6 decimals. */
  /** Max elements any single `sequence()` array may hold in
    * [[quantileNormalize]]'s rank explode — bounds per-task memory even
    * when one quantized score owns most of the corpus. */
  val QnormRankChunk: Long = 65536L

  def quantileNormalize(df: DataFrame, group: String, scoreQ: Column,
      rankChunk: Long = QnormRankChunk): DataFrame = {
    // ranked feeds three consumers (the pooled histogram and the row-side
    // of both rank lookups below); without the persist each consumer
    // re-runs the corpus scan + histogram join of percentileByGroup (the
    // dsir rawBi pattern — freed by the ContextCleaner / harness teardown)
    val ranked = percentileByGroup(df, group, scoreQ)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pooled = ranked.groupBy(col("score_q")).agg(count(lit(1)).as("__c"))
    val before = Window.orderBy(col("score_q").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ph = pooled
      .withColumn("__cum_start", coalesce(sum(col("__c")).over(before), lit(0L)))
      .withColumn("__cum_end", col("__cum_start") + col("__c"))
    val nTot = ph.agg(sum(col("__c")).as("__n_total"))
    val withIdx = ranked.crossJoin(broadcast(nTot))
      .withColumn("__idx", col("pctl") * (col("__n_total") - 1).cast("double"))
      .withColumn("__lo", floor(col("__idx")).cast("long"))
      .withColumn("__hi", ceil(col("__idx")).cast("long"))
      .withColumn("__frac", col("__idx") - col("__lo").cast("double"))
    // rank→value lookup as an EQUI join: each histogram bucket explodes to
    // the pooled ranks it covers ([cum_start, cum_end) — Σ = n rows total,
    // one per corpus row), so both lookups hash-join on a long key. The
    // former broadcast range join was a BroadcastNestedLoopJoin costing
    // rows × |histogram| comparisons — fine on a narrow histogram, but at
    // corpus scale with a wide quantized-score domain it re-grows a
    // quadratic term; the exploded-rank table stays exactly corpus-sized.
    //
    // Two-level explode, NOT one sequence() per bucket: Spark's `sequence`
    // materializes the whole array before explode, so a hot score bucket
    // (millions of docs all at quality 0) would put a bucket-sized array
    // in one task — and >2^31 elements errors outright. Level 1 explodes
    // each bucket into fixed-width rank CHUNKS (⌈c/64k⌉ small longs);
    // level 2 sequences within a chunk, so no task ever holds more than
    // QnormRankChunk elements per array. Row set is identical — every
    // pooled rank appears exactly once with its bucket's score_q.
    require(rankChunk >= 1L, "rankChunk must be positive")
    val ck = lit(rankChunk)
    // persisted: lo and hi are two differently-keyed joins over the SAME
    // exploded table — without it each join subtree re-runs the pooled
    // histogram, its window, and the corpus-sized explode
    val rankVal = ph
      .select(col("score_q"), col("__cum_start"), col("__cum_end"),
        explode(sequence(lit(0L),
          graft.functions.IntMath.intDiv(col("__c") - 1, ck))).as("__ck"))
      .select(col("score_q"),
        explode(sequence(
          col("__cum_start") + col("__ck") * ck,
          least(col("__cum_end"), col("__cum_start") + (col("__ck") + 1) * ck) - 1)).as("__rank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lo = rankVal.select(col("__rank").as("__lo"), col("score_q").as("__v_lo"))
    val hi = rankVal.select(col("__rank").as("__hi"), col("score_q").as("__v_hi"))
    withIdx
      .join(lo, Seq("__lo"))
      .join(hi, Seq("__hi"))
      .withColumn("qnorm",
        round(col("__v_lo").cast("double") +
          (col("__v_hi").cast("double") - col("__v_lo").cast("double")) * col("__frac"), 6))
      .drop("__idx", "__lo", "__hi", "__frac", "__s1", "__e1", "__s2", "__e2",
        "__v_lo", "__v_hi", "__n_total", "pct_below", "pct_n")
  }

  /** k-ANONYMITY audit over quasi-identifier columns — the privacy gate a
    * governed corpus release runs: every row must share its
    * quasi-identifier combination with at least k−1 others, else the
    * combination re-identifies. One hash aggregation to the
    * (|combinations|-row) group table, then a 1-row summary:
    * (k, n_groups, n_violating_groups, n_rows_at_risk, min_group_size,
    * anonymous flag). `n_rows_at_risk` counts the rows in under-k groups
    * — the records a release would have to generalize or suppress.
    * Scale: the corpus shuffles once on the quasi key (map-side
    * combinable); the summary aggregates the group table, bounded by the
    * quasi-identifier domain, not the corpus. */
  def kAnonymityReport(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty && k >= 1L)
    val groups = df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("__gn"))
    groups.agg(
      lit(k).as("k"),
      count(lit(1)).as("n_groups"),
      sum(when(col("__gn") < k, 1L).otherwise(0L)).as("n_violating_groups"),
      sum(when(col("__gn") < k, col("__gn")).otherwise(0L)).as("n_rows_at_risk"),
      min(col("__gn")).as("min_group_size"),
      when(min(col("__gn")) >= k, 1).otherwise(0).as("anonymous"))
  }

  /** The violating-combination detail behind [[kAnonymityReport]] — what a
    * release pipeline would generalize away (ordered by size, smallest =
    * most identifying, first). */
  def kAnonymityViolations(df: DataFrame, quasi: Seq[String], k: Long): DataFrame =
    df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)

  /** ENFORCEMENT of k-anonymity by suppression: drop every row whose
    * quasi-identifier combination has fewer than k members — the simplest
    * release transform (generalization hierarchies are corpus-specific;
    * suppression is the universal floor). One anti-join against the
    * (tiny) violating-combination list; AQE broadcasts it. The released
    * frame is k-anonymous by construction — re-auditing it with
    * [[kAnonymityReport]] must return anonymous = 1 (spec-pinned).
    *
    * The anti-join compares each quasi column NULL-SAFELY (`<=>`):
    * [[kAnonymityReport]]'s groupBy counts a NULL quasi value as a group
    * of its own, so an under-k NULL-group must suppress like any other —
    * a plain-equality anti-join would silently release those
    * re-identifiable rows (r14 ADVICE). */
  def kSuppress(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    val viol = kAnonymityViolations(df, quasi, k)
      .select(quasi.map(c => col(c).as(s"__viol_$c")): _*)
    val cond = quasi.map(c => col(c) <=> col(s"__viol_$c")).reduce(_ && _)
    df.join(viol, cond, "left_anti")
  }

  /** l-DIVERSITY audit — k-anonymity's stronger sibling: within every
    * quasi-identifier group, the SENSITIVE attribute must take at least
    * l distinct values, else group membership leaks it (a k-anonymous
    * group that is 100% one diagnosis still discloses the diagnosis).
    * One aggregation with a per-group distinct count (two-phase,
    * map-side partial distinct) to the quasi-domain-bounded group table,
    * then a 1-row summary mirroring [[kAnonymityReport]]'s shape.
    *
    * Scale note: `countDistinct` holds each group's distinct SENSITIVE
    * values exactly — fine while the sensitive domain is bounded (enums,
    * diagnoses, segments: the governed-release case). For an unbounded
    * sensitive column swap in `approx_count_distinct` (HLL++, kB-bounded
    * buffers crossing the exchange) — the [[Profile.profileApprox]]
    * precedent; the l >= threshold test tolerates HLL error at any
    * realistic l. */
  def lDiversityReport(df: DataFrame, quasi: Seq[String], sensitive: String,
      l: Long): DataFrame = {
    require(quasi.nonEmpty && l >= 1L && !quasi.contains(sensitive))
    val groups = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__gn"), countDistinct(col(sensitive)).as("__gl"))
    groups.agg(
      lit(l).as("l"),
      count(lit(1)).as("n_groups"),
      sum(when(col("__gl") < l, 1L).otherwise(0L)).as("n_violating_groups"),
      sum(when(col("__gl") < l, col("__gn")).otherwise(0L)).as("n_rows_at_risk"),
      min(col("__gl")).as("min_diversity"),
      when(min(col("__gl")) >= l, 1).otherwise(0).as("diverse"))
  }

  /** The unbounded-sensitive-domain l-diversity AUDIT (the HLL fallback
    * [[lDiversityReport]]'s scaladoc promises, gated with the
    * [[Profile.profileApprox]] self-validation device): per quasi-group
    * `approx_count_distinct` (HLL++, fixed kB buffers crossing the
    * exchange — the plan that survives a sensitive column with millions
    * of values) computed ALONGSIDE the exact distinct at gate scale, and
    * a `hll_all_within` flag that is the MIN over groups of a per-group
    * within-bound test (|approx − exact| ≤ max(1, exact × 3·rsd·2.5));
    * any group's sketch drifting out of contract flips the flag and
    * fails the hash gate. Summary columns are the EXACT report (engine-
    * portable) — the sketch contributes only the validated flag. */
  def lDiversityApproxAudit(df: DataFrame, quasi: Seq[String], sensitive: String,
      l: Long, rsd: Double = 0.02): DataFrame = {
    require(quasi.nonEmpty && l >= 1L && !quasi.contains(sensitive))
    // ONE aggregation: approx_count_distinct is a regular (non-distinct)
    // aggregate, so it rides the same groupBy as count + countDistinct —
    // one scan, no group re-join, and NULL quasi groups trivially carry
    // both values (a second scan + null-safe join was measured out in
    // review). The exact countDistinct is the gate-scale validation cost
    // this audit exists to pay; the pure scale plan keeps only the HLL.
    val groups = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__gn"), countDistinct(col(sensitive)).as("__gl"),
        approx_count_distinct(col(sensitive), rsd).as("__gla"))
    val within = when(
      abs(col("__gla") - col("__gl")).cast("double") <=
        greatest(lit(1.0), col("__gl").cast("double") * (rsd * 7.5)), 1).otherwise(0)
    groups.agg(
      lit(l).as("l"),
      count(lit(1)).as("n_groups"),
      sum(when(col("__gl") < l, 1L).otherwise(0L)).as("n_violating_groups"),
      sum(when(col("__gl") < l, col("__gn")).otherwise(0L)).as("n_rows_at_risk"),
      min(col("__gl")).as("min_diversity"),
      when(min(col("__gl")) >= l, 1).otherwise(0).as("diverse"),
      min(within).as("hll_all_within"))
  }
}
