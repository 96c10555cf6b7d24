package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (north-star LLM-pipeline extension,
  * BASELINE.json): flag training documents that share word n-grams with an
  * evaluation/benchmark set, the standard leakage guard run before
  * pre-training (the GPT-3/PaLM "13-gram overlap" filter family).
  *
  * Scale design: benchmark sets are tiny (MBs) next to a 100 TB corpus, so
  * the benchmark n-gram dictionary is built once, deduplicated, and
  * BROADCAST — the training side streams map-side through a broadcast hash
  * join with no shuffle of the corpus. The only shuffle is the final
  * per-doc aggregation over the (vanishingly few) matching grams, which is
  * map-side combinable. N-grams travel as 60-bit md5 hashes
  * ([[Dedup.md5Long]]), not strings, so the broadcast stays compact and
  * the oracle SQL reproduces them exactly.
  */
object Decontam {

  /** Per-training-doc count of distinct n-grams shared with ANY benchmark
    * document. Every training doc appears (zero-overlap docs carry 0), so
    * downstream gates can filter `contaminated` without re-scanning.
    *
    * One pass over the corpus: explode_outer keeps gram-less docs (shorter
    * than n words) as a null-gram row, the broadcast left join marks hits,
    * and a single map-side-combinable aggregation produces the verdict —
    * no second scan or join-back of the training side.
    */
  def ngramOverlap(train: DataFrame, bench: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 4): DataFrame = {
    val trainGrams = train
      .select(col(idCol), explode_outer(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col(idCol), Dedup.md5Long(col("g")).as("gh"))
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(Dedup.md5Long(col("g")).as("gh"))
      .distinct()
      .withColumn("hit", lit(1))
    trainGrams.join(broadcast(benchGrams), Seq("gh"), "left_outer")
      .groupBy(col(idCol))
      .agg(sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_hits"))
      .select(col(idCol),
        col("n_hits").as("n_contaminated_ngrams"),
        (col("n_hits") > 0L).as("contaminated"))
  }

  /** Bloom-filter decontamination — the scale path for when even the
    * DEDUPLICATED benchmark gram dictionary is too large to broadcast as
    * an exact hash set (a full eval-suite union at 13-gram granularity):
    * the benchmark is compressed to an `mBits`-bit Bloom bitmask (8 KB at
    * the default 2^16 — shippable to every executor as ONE literal), and
    * the corpus probes it map-side. Kirsch–Mitzenmacher double hashing:
    * position_i = (h1 + i·h2) mod m, h1/h2 = 32-bit md5 of the gram and
    * of "b:"‖gram — max h1 + 2·h2 < 2^34, no BIGINT overflow in either
    * engine, so the oracle replays the EXACT bit positions and the flag
    * set (including its false positives) is deterministic.
    *
    * One-sided error by construction: a gram in the benchmark always
    * probes all-ones, so exact-contaminated ⊆ bloom-flagged (no false
    * negatives — the property a leakage gate must keep; DecontamSpec pins
    * it). False positives over-quarantine at the configured m/k rate.
    *
    * Output per training doc: (idCol, n_flagged_ngrams, contaminated
    * _bloom); gram-less docs carry 0/false, like [[ngramOverlap]]. */
  def bloomNgramFlags(train: DataFrame, bench: DataFrame,
      textCol: String = "text", idCol: String = "doc_id", n: Int = 4,
      mBits: Int = 1 << 16, k: Int = 3): DataFrame = {
    require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
    def positions(h1: org.apache.spark.sql.Column, h2: org.apache.spark.sql.Column) =
      (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong)))
    // build: distinct bench-gram bit positions -> driver bitmask (bounded
    // by mBits/8 bytes regardless of benchmark size — the whole point)
    val benchPos = bench
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(Dedup.md5Int32(col("g")).as("h1"),
        Dedup.md5Int32(concat(lit("b:"), col("g"))).as("h2"))
      .select(explode(array(positions(col("h1"), col("h2")): _*)).as("p"))
      .distinct().collect().map(_.getLong(0).toInt)
    val mask = new Array[Long](mBits / 64)
    benchPos.foreach(p => mask(p >> 6) |= (1L << (p & 63)))
    // r17 (guide §4): the probe side is ONE map-only codegen'd pass — the
    // fused kernel dedups grams, hashes, and probes the k positions per
    // document, replacing the shingle HOF (a CodegenFallback) + per-gram
    // explode + md5-hex round trips + per-doc aggregation shuffle. Same
    // hashes, same positions, same distinct-gram counting (DecontamSpec
    // pins new ≡ old and the one-sided-error property).
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val cnt = ColumnBridge.column(graft.functions.BloomNgramFlagCount(
      ColumnBridge.expression(col(textCol)), n, mask.toSeq, mBits, k))
    train
      .select(col(idCol), coalesce(cnt, lit(0L)).as("n_flagged_ngrams"))
      .select(col(idCol), col("n_flagged_ngrams"),
        (col("n_flagged_ngrams") > 0L).as("contaminated_bloom"))
  }

  /** Exact-span verification of n-gram contamination: where [[ngramOverlap]]
    * counts HASHED gram hits (a 60-bit collision can flag a clean doc),
    * this verifies each candidate by exact string equality and then merges
    * verified gram positions into maximal contaminated SPANS — the
    * report a leakage audit actually reads ("doc X shares a 23-word run
    * with the benchmark"), per Lee et al.'s span-level dedup framing.
    *
    * The join carries the hash AND the gram text: the hash is the compact
    * equi key (what the broadcast hashmap stores at 100 TB), the string
    * equality is the residual verify filter — collisions cost a compare,
    * never a false flag. Overlapping/adjacent verified grams merge via
    * the islands-and-gaps window (the `dedup_repeated_ngram_spans`
    * machinery), all integer arithmetic.
    *
    * Returns per contaminated doc: (idCol, n_spans, max_span_words,
    * n_grams); clean docs are absent (the cheap `ngramOverlap` pass is
    * the keep-everything gate). */
  def exactSpans(train: DataFrame, bench: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // positional grams, NOT Dedup.shingles: that one is array_distinct'd,
    // so posexplode positions would index the DISTINCT array and a gram
    // repeated earlier in the doc would shift every later span
    val wsCol = split(col(textCol), " ")
    val posGrams = when(size(wsCol) >= n,
      transform(sequence(lit(0), size(wsCol) - n),
        i => concat_ws(" ", slice(wsCol, i + 1, lit(n)))))
      .otherwise(array())
    val trainGrams = train
      .select(col(idCol), posexplode(posGrams))
      .toDF(idCol, "pos", "g")
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(textCol), n)).as("bg"))
      .distinct()
      .select(Dedup.md5Long(col("bg")).as("gh"), col("bg"))
    val verified = trainGrams
      .join(broadcast(benchGrams),
        Dedup.md5Long(col("g")) === col("gh") && col("g") === col("bg"))
      .select(col(idCol), col("pos").cast("long").as("pos"))
      .distinct()
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    verified
      .withColumn("prev_end", max(col("pos") + n).over(wPrev))
      .withColumn("island",
        sum(when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L)
          .otherwise(0L)).over(wRun))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + n).as("e"),
        count(lit(1)).as("ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        max(col("e") - col("s")).as("max_span_words"),
        sum(col("ng")).as("n_grams"))
  }
}
