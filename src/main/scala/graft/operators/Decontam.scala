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
    */
  def ngramOverlap(train: DataFrame, bench: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 4): DataFrame = {
    val trainGrams = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col(idCol), Dedup.md5Long(col("g")).as("gh"))
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(Dedup.md5Long(col("g")).as("gh"))
      .distinct()
    val hits = trainGrams.join(broadcast(benchGrams), "gh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_contaminated_ngrams"),
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("contaminated"))
  }
}
