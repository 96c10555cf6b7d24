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
}
