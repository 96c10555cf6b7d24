package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for LLM-pipeline data curation (north-star
  * extensions, BASELINE.json). Not present in the reference — built from
  * the same relational primitives (SURVEY.md §2.2).
  *
  * Scale notes: exact dedup is a single hash-shuffle on a 16-byte digest
  * (map-side partial aggregation applies); MinHash/SimHash candidate
  * generation is linear scans + one shuffle on (band, signature) — never a
  * cross join; only candidate pairs (a tiny fraction) get verified.
  */
object Dedup {

  /** Stable 64-bit hash from md5 — identical in DuckDB via
    * `('0x' || substr(md5(x),1,15))::BIGINT` (15 hex chars = 60 bits,
    * non-negative, fits BIGINT in both engines). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  def md5LongSql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Exact duplicate groups: content hash → group size + canonical (min) id. */
  def exactDupGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("canonical_id"))

  /** Exact dedup: keep the min-id row of each identical-content group. */
  def exactDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Word w-shingles of a document (overlapping word n-grams), distinct. */
  def shingles(textCol: Column, w: Int): Column = {
    val words = split(textCol, " ")
    // slide over word indices: shingle i = words[i..i+w-1] joined
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(words) - w, lit(0))),
          i => when(size(words) >= w, concat_ws(" ", slice(words, i + 1, lit(w))))),
        s => s.isNotNull))
  }

  /** 32-bit stable hash from md5 (8 hex chars) — small enough that
    * (a*h + b) with 30-bit coefficients never overflows a signed 64-bit
    * int, in Spark OR DuckDB (DuckDB errors on BIGINT overflow). */
  def md5Int32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  def md5Int32Sql(expr: String): String =
    s"CAST(('0x' || substr(md5($expr), 1, 8)) AS BIGINT)"

  /** Deterministic universal-hash coefficients (a_j, b_j) for MinHash. */
  def minHashCoeffs(numHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(numHashes)(
      (rnd.nextInt(1 << 30).toLong + 1L, rnd.nextInt(1 << 30).toLong))
  }
  val MinHashP = 2147483647L // 2^31 - 1

  /** MinHash signatures: for each of `numHashes` permutations
    * h_j(x) = (a_j * x + b_j) mod p over the 32-bit shingle hash, the min
    * across the doc's shingles. Deterministic a/b from a fixed seed.
    *
    * r10: computed by the FUSED one-pass kernel
    * ([[graft.functions.MinHashSigExpr]]) — one codegen'd expression per
    * document instead of shingle-explode → md5-hex → conv → 8 pmod →
    * groupBy-min, eliminating the per-shingle string round-trips AND the
    * per-doc aggregation shuffle. Values are bit-identical (the kernel
    * doc lists the equivalences); docs with no w-shingle are filtered,
    * mirroring the groupBy form that produced no row for them. */
  def minHashSignature(docs: DataFrame, textCol: String, idCol: String,
      shingleWidth: Int = 3, numHashes: Int = 16): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val coeffs = minHashCoeffs(numHashes)
    val sigCol = ColumnBridge.column(graft.functions.MinHashSigExpr(
      ColumnBridge.expression(col(textCol)), shingleWidth,
      coeffs.map(_._1), coeffs.map(_._2), MinHashP))
    docs.select(col(idCol), sigCol.as("_mh"))
      .filter(col("_mh").isNotNull)
      .select(col(idCol) +:
        (0 until numHashes).map(j => col("_mh").getItem(j).as(s"mh_$j")): _*)
  }

  /** Hot-bucket cap for every LSH band-bucket self-join here: candidate
    * volume is Σ bucket², so ONE band bucket holding a large near-identical
    * pocket (a boilerplate template corpus) is a quadratic cliff no
    * exact-dedup prefix can absorb — exact dedup collapses only IDENTICAL
    * texts. Buckets above the cap are dropped from pairing (the df-cap
    * reasoning of [[fingerprintEdges]]: a shared key in >cap docs is a
    * boilerplate signal, not a similarity signal) and stay observable via
    * [[lshHotBandAudit]]. 1024 bounds any single bucket's pair volume at
    * ~5·10⁵ while sitting two orders of magnitude above real bucket sizes
    * (max observed band bucket at sf0.1: 12). */
  val LshMaxBucket: Int = 1024

  /** Bucket-size gate on a bucket table: aggregate the (tiny) over-cap
    * key list, then anti-join it out. Measured against the window-count
    * form ([[fingerprintEdges]]'s device): the window re-shuffles AND
    * sorts the full bucket table on EACH self-join side (~2× on the whole
    * MinHash family at sf0.1), while the aggregation is map-side
    * combinable and its output is only the over-cap keys — near-empty by
    * definition (≤ n/maxBucket, usually zero). No broadcast hint: AQE
    * converts the anti-join to broadcast when the hot list is actually
    * small, and keeps it a shuffle join in the adversarial case where
    * millions of buckets overflow.
    *
    * DROP SURFACING (r13, ADVICE): an `observe`/CollectMetrics node on the
    * hot list was built and MEASURED OUT — it cost ~55% on the whole LSH
    * family at sf0.1 (0.73→1.15 s per query under BenchOne A/B; the
    * metrics barrier stops AQE from broadcasting the near-empty anti-join
    * build side, so the full bucket table pays a shuffle anti-join).
    * Drops are therefore surfaced by CONTRACT instead: the recall caveat
    * documented at [[minHashLshNearDupPairs]] / [[nearDupPipeline]], and
    * [[lshHotBandAudit]] (gated as `dedup_lsh_hot_buckets`) as the
    * queryable per-bucket report a pipeline schedules next to dedup. */
  private def capHotBuckets(buckets: DataFrame, keyCols: Seq[String],
      maxBucket: Int): DataFrame = {
    val hot = buckets.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") > maxBucket)
      .drop("__bsz")
    buckets.join(hot, keyCols, "left_anti")
  }

  /** LSH banding over minhash signatures: docs sharing any band land in the
    * same bucket; same-bucket pairs are near-dup candidates. Buckets larger
    * than `maxBucket` are dropped (see [[LshMaxBucket]]). */
  def lshCandidatePairs(sig: DataFrame, idCol: String, numHashes: Int, bands: Int,
      maxBucket: Int = LshMaxBucket): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh_$j")): _*).as("sig"))
    }
    // persisted: both self-join sides read the capped table from cache
    // (the minHashLshNearDupPairs contract)
    val buckets = capHotBuckets(
      sig.select(col(idCol), explode(array(bandCols: _*)).as("bk"))
        .select(col(idCol), col("bk.band").as("band"), col("bk.sig").as("sig")),
      Seq("band", "sig"), maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** n-gram Jaccard similarity between two token-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** Full MinHash-LSH near-dup pipeline (shingle → minhash → band →
    * bucket-join → exact-Jaccard verify), engine-portable: band keys are
    * the concatenated minhash values of the band (not murmur3), so the
    * DuckDB oracle reproduces them exactly.
    *
    * Scale: candidate generation is linear scans + ONE shuffle on
    * (band, key); only same-bucket pairs (a vanishing fraction at 100 TB)
    * reach the exact-Jaccard verification join. Never a cross join.
    *
    * RECALL CAVEAT — the hot-bucket cap: band buckets holding more than
    * `maxBucket` ([[LshMaxBucket]] = 1024) docs are DROPPED from pairing,
    * so a near-identical (but not byte-identical) pocket larger than the
    * cap escapes near-dup detection entirely (exact dedup collapses only
    * identical texts). Run [[exactDedup]] first (the [[nearDupPipeline]]
    * order) so identical-copy cliques never reach the cap, and schedule
    * [[lshHotBandAudit]] (the `dedup_lsh_hot_buckets` query) next to any
    * dedup run — it reports exactly which (band, bucket) keys were
    * dropped and how many docs they held. Pass a larger `maxBucket` to
    * trade candidate volume for recall.
    */
  /** (id, band, bkey) LSH bucket rows from a signature table — band key =
    * the band's minhash values joined positionally. */
  private def lshBuckets(sig: DataFrame, idCol: String, numHashes: Int,
      bands: Int): DataFrame = {
    val rpb = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (b * rpb until (b + 1) * rpb).map(j => col(s"mh_$j")): _*).as("bkey"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Corpus size above which the candidate-prefilter path pays for itself
    * (below it, every doc is a candidate and the semi-join + distinct are
    * pure overhead — a confirmed 2-3.5× fixed cost at the 60k-doc bench
    * scale, vs the 13× win it buys at 10M docs). */
  val PrefilterMinDocs: Long = 100000L

  def minHashLshNearDupPairs(docs: DataFrame, textCol: String, idCol: String,
      shingleWidth: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.5, docCountHint: Long = -1L,
      maxBucket: Int = LshMaxBucket): DataFrame =
    minHashLshNearDupPairsWithDrops(docs, textCol, idCol, shingleWidth,
      numHashes, bands, threshold, docCountHint, maxBucket)._1

  /** [[minHashLshNearDupPairs]] plus IN-BAND drop accounting: also returns
    * the (band, bkey, n_docs) rows of every bucket the hot-bucket cap
    * removed from pairing — the [[lshHotBandAudit]] report computed from
    * the SAME persisted signature table, so reading it after the pair job
    * is one cheap cache-side aggregation instead of a second corpus scan
    * (and, unlike the measured-out `observe()` route, it adds NO node to
    * the pair plan, so AQE's broadcast anti-join is untouched). Count the
    * stats frame AFTER an action on the pairs frame to ride the cache. */
  def minHashLshNearDupPairsWithDrops(docs: DataFrame, textCol: String,
      idCol: String, shingleWidth: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.5, docCountHint: Long = -1L,
      maxBucket: Int = LshMaxBucket): (DataFrame, DataFrame) = {
    // Persist the signature table: the bucket self-join's build side is a
    // BroadcastExchange, so exchange reuse can NOT share the md5+minhash
    // subtree between the two sides — without the persist it runs twice.
    // k×9 longs per doc: tiny relative to the corpus; Spark's ContextCleaner
    // drops it when the plan is garbage-collected.
    val sig = minHashSignature(docs, textCol, idCol, shingleWidth, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dropStats = lshBuckets(sig, idCol, numHashes, bands)
      .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)
    // hot-bucket cap BEFORE the self-join — the quadratic guard
    // ([[LshMaxBucket]]). Persisted: BOTH self-join sides (probe + the
    // broadcast build) read the capped table from cache, so the cap's
    // aggregation + anti-join run once, not once per side.
    val buckets = capHotBuckets(
        lshBuckets(sig, idCol, numHashes, bands), Seq("band", "bkey"), maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candRaw = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    // Cost-based path choice (the small-graph-BFS pattern in GraphOps /
    // connectedComponents): the left-semi candidate prefilter below is the
    // scale path — at 10M docs the full-corpus shingle cache OOM'd an
    // executor heap and the prefilter made near-dup 13× faster — but on a
    // small corpus nearly every doc is a candidate, so the prefilter's
    // extra shuffle/distinct/joins are pure fixed cost. Callers that know
    // the corpus size pass it (the catalog-stats lookup); otherwise one
    // bounded probe (LIMIT n+1 over the id column) decides.
    val usePrefilter =
      (if (docCountHint >= 0L) docCountHint
       else docs.select(col(idCol)).limit(PrefilterMinDocs.toInt).count()
      ) >= PrefilterMinDocs
    if (usePrefilter) {
      // persisted: read three times below (two id projections + the verify
      // join); candidate volume is bounded by bucket sizes, a vanishing
      // fraction of the corpus
      val cand = candRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // r10: shingle sets are built ONLY for docs that appear in a candidate
      // pair (left-semi prefilter), not the whole corpus. The old full-corpus
      // sets cache held every doc's word-trigram array (~w× the corpus text)
      // — it OOM'd the 10M probe's executor heap and burned shingle CPU on
      // rows no verify join would ever read. The prefilter shuffles slim
      // (id, text) rows once; candidates are a vanishing fraction at scale,
      // so the persisted verify-side table shrinks by orders of magnitude.
      val candIds = cand.select(col("id_a").as(idCol))
        .union(cand.select(col("id_b").as(idCol)))
        .distinct()
      val sets = docs.join(candIds, Seq(idCol), "left_semi")
        .select(col(idCol), shingles(col(textCol), shingleWidth).as("sset"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (verifyPairs(cand, sets, threshold, idCol), dropStats)
    } else {
      // small corpus: shingle the whole table once (cheap at this size),
      // skip the prefilter machinery; cand feeds exactly one join chain so
      // it needs no persist either
      val sets = docs
        .select(col(idCol), shingles(col(textCol), shingleWidth).as("sset"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (verifyPairs(candRaw, sets, threshold, idCol), dropStats)
    }
  }

  /** Exact-Jaccard verification of candidate pairs against a
    * (id, shingle-set) table — shared tail of both cost paths above.
    * `idCol` is passed explicitly (not inferred from column position) so a
    * caller with a reordered sets frame can't silently join on the wrong
    * column. */
  private def verifyPairs(cand: DataFrame, sets: DataFrame, threshold: Double,
      idCol: String): DataFrame = {
    cand
      .join(sets.select(col(idCol).as("id_a"), col("sset").as("set_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("sset").as("set_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("set_a"), col("set_b")).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Full near-dup pipeline in the order that survives real corpora:
    * EXACT dedup first (hash-group to one canonical row per identical
    * text), THEN MinHash-LSH near-dup pairing on the survivors. Skipping
    * the exact pass is a scale cliff: replicated documents form n-cliques
    * in every LSH bucket, exploding candidate pairs quadratically
    * (1000 copies of one doc = 499 500 candidate pairs that all verify at
    * jaccard 1.0 — demonstrated in ScaleProbe).
    *
    * Inherits [[minHashLshNearDupPairs]]'s hot-bucket cap: NON-identical
    * near-dup pockets larger than [[LshMaxBucket]] drop out of pairing —
    * schedule [[lshHotBandAudit]] next to this pipeline for the
    * per-bucket drop report. */
  def nearDupPipeline(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", shingleWidth: Int = 3, numHashes: Int = 8,
      bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    // probe the RAW input, not the dedup output — probing the windowed
    // dedup plan would force its shuffle just to count it; the raw count
    // upper-bounds the deduped count, so a false-positive only enables the
    // prefilter on a corpus that shrank below the threshold (harmless: the
    // prefilter is the always-correct scale path)
    val hint = docs.select(col(idCol)).limit(PrefilterMinDocs.toInt).count()
    minHashLshNearDupPairs(exactDedup(docs, textCol, idCol),
      textCol, idCol, shingleWidth, numHashes, bands, threshold,
      docCountHint = hint)
  }

  /** Connected components over a near-dup pair table (min-label
    * propagation): every node converges to the smallest doc id reachable
    * from it — the canonical representative of its duplicate cluster. The
    * missing last step of every dedup pipeline: pairs → clusters → keep
    * one per cluster.
    *
    * Scale: each iteration is one join + one aggregation on the edge list
    * (both shuffles on node id); `localCheckpoint` truncates the iterative
    * lineage so plans stay constant-size. Rounds needed = component
    * diameter — near-dup clusters are clique-ish, so a handful. */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 15,
      driverThreshold: Long = 500000): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Cost-based path choice (same pattern as Knn's bruteForceThreshold):
    // the near-dup edge set is tiny relative to the corpus — edges exist
    // only BETWEEN near-duplicate docs — so even a 100 TB corpus usually
    // yields a graph that fits on the driver, where path-compressed
    // union-find finishes in milliseconds instead of a multi-job loop.
    // The small-graph probe is ONE job: collect at most threshold+1 raw
    // edges (no symmetrize/distinct/checkpoint first — union-find needs
    // neither, and the eager materialization cost three jobs per call,
    // ~2s of the curation pipeline's wall time at bench scale). Above the
    // threshold — or for non-long id columns, which the driver path's
    // primitive union-find can't carry — fall through to the type-generic
    // distributed min-label propagation (covered by specs with
    // driverThreshold = 0).
    val rawLong = Seq(idA, idB).forall(c =>
      edges.schema(c).dataType == org.apache.spark.sql.types.LongType)
    if (rawLong && driverThreshold > 0 && driverThreshold < Int.MaxValue) {
      val probe = edges.select(col(idA), col(idB))
        .limit(driverThreshold.toInt + 1).collect()
      if (probe.length <= driverThreshold)
        return unionFindDriver(probe, edges.sparkSession)
    }
    // hash-partitioned on src before the eager checkpoint: every hop
    // joins the edge list on src, and the checkpointed partitioning is
    // reused — per iteration only the (|nodes|-row) label table
    // exchanges, not the edges (same trick as GraphOps.pageRank)
    val sym = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().repartition(col("src")).localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    if (labels.isEmpty) return labels.withColumnRenamed("label", "canonical")

    // One min-label hop: label := min(label, min over in-neighbors' labels).
    def hop(l: DataFrame): DataFrame = {
      val nbrMin = sym.join(l.select(col("id").as("nid"), col("label").as("nlab")),
          col("src") === col("nid"))
        .groupBy(col("dst")).agg(min(col("nlab")).as("nlabel"))
      l.join(nbrMin, l("id") === nbrMin("dst"), "left")
        .select(l("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
    }
    // Labels only decrease, so an unchanged (exact decimal) sum == fixpoint
    // — one cheap aggregate instead of a change-detection join.
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("label").cast(DecimalType(38, 0)))).head().getDecimal(0)

    var prevSum = labelSum(labels)
    var i = 0
    var done = false
    while (!done && i < maxIter) {
      // two hops per materialization: halves the checkpoint/scheduling
      // overhead, which dominates over the (tiny) label table's data cost
      labels = hop(hop(labels)).localCheckpoint(true)
      val s = labelSum(labels)
      done = s.compareTo(prevSum) == 0
      prevSum = s
      i += 1
    }
    require(done, s"connectedComponents did not converge in ${2 * maxIter} hops")
    labels.withColumnRenamed("label", "canonical")
  }

  /** Driver-side union-find over a collected edge list (raw pairs —
    * duplicates and one-directional edges are fine); canonical label =
    * min id per component (identical contract to the distributed loop). */
  private def unionFindDriver(edgeRows: Array[org.apache.spark.sql.Row],
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edgeRows.foreach { row =>
      val a = row.getLong(0); val b = row.getLong(1)
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      // union by min keeps roots = component minima
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "canonical")
  }

  /** Pair edges from a (id, fingerprint) table with a document-frequency
    * cap on the bucket join: only fingerprints shared by at most
    * `maxBucket` documents generate pairs. The self-join is quadratic in
    * bucket size — one boilerplate fingerprint shared by 10^5 docs would
    * cost 10^10 candidate rows — and a key that common carries no
    * duplication signal anyway (the df-bounded-bucket reasoning of
    * [[SetSimJoin]]'s prefix index and exact dedup's clique cap). Dropped
    * buckets are observable via [[hotBucketAudit]].
    *
    * Scale shape: one aggregation to the (tiny) hot-key list, a broadcast
    * anti-join gate on the fingerprint table, then the bounded bucket
    * self-join — candidate volume ≤ maxBucket × |rows|, never |bucket|².
    */
  def fingerprintEdges(fps: DataFrame, idCol: String = "doc_id",
      fpCol: String = "fp", maxBucket: Int = 256): DataFrame = {
    // bucket size via a window on fpCol, not a separate groupBy+anti-join:
    // the window's exchange partitions by the SAME key the self-join needs,
    // so both join sides reuse one identical (dedup'd) exchange subtree —
    // the cap costs a window pass, not an extra aggregation + broadcast
    val kept = fps
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col(fpCol))))
      .filter(col("__bsz") <= maxBucket)
      .drop("__bsz")
    kept.as("a").join(kept.as("b"),
        col(s"a.$fpCol") === col(s"b.$fpCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** The audit side of [[fingerprintEdges]]'s cap: each dropped
    * fingerprint bucket with its size — the observability row a governed
    * dedup run logs next to the pair count. */
  def hotBucketAudit(fps: DataFrame, idCol: String = "doc_id",
      fpCol: String = "fp", maxBucket: Int = 256): DataFrame =
    fps.groupBy(col(fpCol)).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** The audit side of [[minHashLshNearDupPairs]]'s band-bucket cap: each
    * dropped (band, bkey) bucket with its population — what a governed
    * dedup run logs next to the pair count so capped boilerplate pockets
    * are observable, not silent. */
  def lshHotBandAudit(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", shingleWidth: Int = 3, numHashes: Int = 8,
      bands: Int = 4, maxBucket: Int = LshMaxBucket): DataFrame =
    lshBuckets(minHashSignature(docs, textCol, idCol, shingleWidth, numHashes),
        idCol, numHashes, bands)
      .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** SimHash: 64-bit signature where bit i is the sign of the sum over
    * tokens of (+1 if bit i of token-hash set else -1). Near-dups have
    * small Hamming distance. */
  def simHash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", md5Long(col("w")))
    val bitSums = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b_$i")
    }
    val sums = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail.toSeq: _*)
    val sig = (0 until 60).map { i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    sums.select(col(idCol), sig.as("simhash"))
  }

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** SimHash near-dup pairs: all (id_a < id_b) with Hamming distance ≤
    * `maxHamming` between 60-bit signatures. Candidate generation splits
    * each signature into `maxHamming + 1` bands — by pigeonhole, two sigs
    * within the threshold must agree EXACTLY on at least one band, so the
    * band-bucket self-join has recall 1 and the full cross product never
    * materializes (same shape as the MinHash-LSH and prefix-filter
    * paths: linear explode + one bucket-join + verify-on-candidates). */
  def simHashNearDupPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame =
    bandedHammingPairs(simHash(docs, textCol, idCol), "simhash", idCol,
      maxHamming, sigBits = 60)

  /** Banded Hamming pairing over a PRECOMPUTED bit-signature column: all
    * (id_a < id_b) with Hamming distance ≤ `maxHamming` between `sigBits`-
    * bit signatures. The geometry-free half of [[simHashNearDupPairs]] —
    * any fingerprint (text SimHash, perceptual image hash, …) reuses the
    * same pigeonhole candidate generation: `maxHamming + 1` bands of
    * `sigBits / (maxHamming+1)` low-order bits each; two sigs within the
    * threshold must agree exactly on ≥ 1 band (bits above the banded
    * region only LOWER the banded difference count, so recall stays 1),
    * and the band-bucket self-join never materializes the cross product.
    * The arithmetic `shiftright` sign-extends on bit-63 signatures; the
    * band mask strips the extension bits, so 64-bit signatures are safe. */
  def bandedHammingPairs(sig: DataFrame, sigCol: String, idCol: String,
      maxHamming: Int, sigBits: Int): DataFrame = {
    val bands = maxHamming + 1
    val bandBits = sigBits / bands
    require(bandBits >= 1, s"sigBits=$sigBits too small for maxHamming=$maxHamming")
    val mask = (1L << bandBits) - 1
    val banded = sig.select(col(idCol).as("id"), col(sigCol).as("__sig"),
      explode(array((0 until bands).map(b => struct(
        lit(b).as("band"),
        shiftright(col(sigCol), b * bandBits).bitwiseAND(lit(mask)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("__sig"), col("bk.band"), col("bk.key"))
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.__sig"), col("b.__sig")).as("hamming"))
      .distinct()
    cands.filter(col("hamming") <= maxHamming)
  }

  /** Cross-document repeated n-gram SPANS — substring-level dedup at
    * n-gram granularity (the "Deduplicating Training Data Makes Language
    * Models Better" family, approximated with fixed-width grams instead of
    * a suffix array): find maximal word ranges of each document that are
    * covered by n-grams occurring in >= minDf distinct documents. Those
    * spans are the boilerplate/licence/quote regions document-level dedup
    * cannot see.
    *
    * Output: (doc_id, span_start, span_end, n_grams) — [start, end) word
    * indices of each maximal repeated region (touching/overlapping gram
    * intervals merged), n_grams = how many flagged grams cover it.
    *
    * Scale shape: one explode to positioned 60-bit gram hashes (strings
    * never leave the row), ONE corpus-wide aggregation for gram document
    * frequency, a hash join of grams against the (small) repeated-gram
    * dictionary, then a per-document window over FLAGGED grams only —
    * islands-and-gaps via running max end, no self-join, no suffix
    * structure. The df aggregation is the inherent shuffle; everything
    * else is key-local. */
  def repeatedNgramSpans(docs: DataFrame, n: Int, minDf: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    repeatedNgramSpansByKey(docs, n, minDf, textCol, idCol, md5Long)

  /** [[repeatedNgramSpans]] with EXACT gram strings as keys instead of
    * 60-bit hashes — the collision-free form (a hash collision in the
    * hashed variant can flag a span that never repeats; here the gram
    * itself is the key, so spans are exactly the Lee-et-al duplicated
    * regions at n-gram granularity). Trade: the df shuffle carries the
    * gram text (~n words/row) instead of one long — the price of
    * exactness; at 100 TB run the hashed pass first and this one only
    * over the flagged docs. */
  def repeatedNgramSpansExact(docs: DataFrame, n: Int, minDf: Int = 2,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    repeatedNgramSpansByKey(docs, n, minDf, textCol, idCol, identity)

  private def repeatedNgramSpansByKey(docs: DataFrame, n: Int, minDf: Int,
      textCol: String, idCol: String, keyFn: Column => Column): DataFrame = {
    require(n >= 1 && minDf >= 2, s"need n >= 1, minDf >= 2; got n=$n, minDf=$minDf")
    val words = split(col(textCol), " ")
    // positioned gram keys; docs shorter than n words produce none
    // (sequence() would count DOWN for a negative upper bound — guard it)
    // persisted: the positioned gram table feeds BOTH the df aggregation
    // and the flagged join — without it the posexplode + per-gram key
    // over the whole corpus runs twice (the two consumers' shuffles
    // can't share the subtree). Freed by the ContextCleaner with the
    // returned plan, same as the LSH signature persist.
    val grams = docs.select(col(idCol), posexplode(
        when(size(words) >= n,
          transform(sequence(lit(0), size(words) - n),
            i => keyFn(concat_ws(" ", slice(words, i + 1, lit(n))))))
          .otherwise(array()))
        .as(Seq("pos", "gh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = grams.groupBy(col("gh"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("gh"))
    val flagged = grams.join(hot, "gh")
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    flagged
      .withColumn("__prev_end",
        max(col("pos") + n).over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new_island",
        when(col("__prev_end").isNull || col("pos") > col("__prev_end"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new_island"))
        .over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).cast(LongType).as("span_start"),
        (max(col("pos")) + n).cast(LongType).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_grams"))
  }

  /** Incremental (batch-vs-corpus) dedup — the daily-crawl admission path:
    * classify each BATCH document against the existing corpus as
    *   'exact' (identical text exists in the corpus),
    *   'near'  (MinHash-LSH candidate verifying at jaccard >= threshold), or
    *   'keep'  (novel),
    * with match_id = the smallest matching corpus id (exact wins over
    * near; -1 when novel). Output: (idCol, verdict, match_id), one row per
    * batch doc.
    *
    * The scale point vs [[minHashLshNearDupPairs]]: the corpus NEVER
    * self-joins — the batch's digests and LSH buckets (tiny) broadcast
    * against the corpus's, so admission cost is O(batch) probes per day,
    * not O(corpus²). At 100 TB the corpus digest/signature tables are the
    * store's persisted dedup index, built once and appended to; here they
    * are recomputed because the fixture has no store between queries. */
  /** The corpus's persisted dedup index: exactly the three tables a
    * production store keeps next to the data and appends to per ingest —
    * text digests (exact path), LSH band buckets (candidate path), and
    * shingle sets (verification path). Each is persisted; admission
    * probes never rescan the corpus text. */
  final case class DedupIndex(
      digests: DataFrame, // (__digest, __exact_id = min corpus id)
      buckets: DataFrame, // (__cid, band, bkey)
      sets: DataFrame)    // (__cid, __s__cid shingle set)

  /** Build the corpus index (the once-per-store-generation cost; append
    * per ingest in production — here rebuilt because the fixture has no
    * store between queries). */
  /** Index buckets are deliberately NOT hot-bucket-capped (unlike the
    * self-join paths): admission probes join BATCH buckets against index
    * buckets, so candidate volume is bounded by |batch|·|bucket| — linear
    * in the batch, never |bucket|². Capping here would instead change
    * admission SEMANTICS (a batch doc colliding with a boilerplate pocket
    * would silently admit as "keep"). A corpus with such pockets should
    * run [[exactDedup]] / [[minHashLshNearDupPairs]] (capped + audited)
    * before indexing — the [[nearDupPipeline]] order. */
  def buildDedupIndex(corpus: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      shingleWidth: Int = 3, numHashes: Int = 8, bands: Int = 4): DedupIndex = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpusP = corpus.select(col(idCol), col(textCol)).persist(lvl)
    val digests = corpusP
      .select(md5(col(textCol)).as("__digest"), col(idCol).as("__cid"))
      .groupBy(col("__digest")).agg(min(col("__cid")).as("__exact_id"))
      .persist(lvl)
    val buckets = lshBuckets(
        minHashSignature(corpusP, textCol, idCol, shingleWidth, numHashes),
        idCol, numHashes, bands)
      .select(col(idCol).as("__cid"), col("band"), col("bkey"))
      .persist(lvl)
    val sets = corpusP.select(col(idCol).as("__cid"),
        shingles(col(textCol), shingleWidth).as("__s___cid"))
      .persist(lvl)
    DedupIndex(digests, buckets, sets)
  }

  /** Admission probe of one batch against a prebuilt corpus index —
    * O(batch) digest probes + the batch's bucket join; the corpus text is
    * never touched. Output contract identical to [[incrementalDedup]]. */
  def admitBatch(index: DedupIndex, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      shingleWidth: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val batchP = batch.select(col(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = batchP.select(col(idCol), md5(col(textCol)).as("__digest"))
      .join(index.digests, Seq("__digest"), "left")
      .select(col(idCol), col("__exact_id"))
    val cand = lshBuckets(
        minHashSignature(batchP, textCol, idCol, shingleWidth, numHashes),
        idCol, numHashes, bands)
      .select(col(idCol).as("__bid"), col("band"), col("bkey"))
      .join(index.buckets, Seq("band", "bkey"))
      .select(col("__bid"), col("__cid"))
      .distinct()
    val bsets = batchP.select(col(idCol).as("__bid"),
      shingles(col(textCol), shingleWidth).as("__s___bid"))
    val near = cand
      .join(bsets, "__bid")
      .join(index.sets, "__cid")
      .filter(jaccard(col("__s___bid"), col("__s___cid")) >= threshold)
      .groupBy(col("__bid")).agg(min(col("__cid")).as("__near_id"))
    exact.join(near, col(idCol) === col("__bid"), "left")
      .select(col(idCol),
        when(col("__exact_id").isNotNull, "exact")
          .when(col("__near_id").isNotNull, "near")
          .otherwise("keep").as("verdict"),
        coalesce(col("__exact_id"), col("__near_id"), lit(-1L)).as("match_id"))
  }

  def incrementalDedup(corpus: DataFrame, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      shingleWidth: Int = 3, numHashes: Int = 8, bands: Int = 4,
      threshold: Double = 0.5): DataFrame =
    admitBatch(
      buildDedupIndex(corpus, textCol, idCol, shingleWidth, numHashes, bands),
      batch, textCol, idCol, shingleWidth, numHashes, bands, threshold)
}
