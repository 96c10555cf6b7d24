package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (PPJoin family,
  * Xiao et al. 2008) — the EXACT counterpart of the MinHash-LSH near-dup
  * path: all pairs with Jaccard ≥ t, no false negatives, no verification
  * of the full cross product.
  *
  * Principle: order every set's tokens by one global canonical order
  * (ascending document frequency, then token — rarest first); two sets
  * with Jaccard ≥ t MUST share a token within each other's first
  * `|s| - ceil(t·|s|) + 1` tokens. So only pairs co-occurring in some
  * PREFIX token bucket are candidates, and rare-first ordering makes
  * those buckets small.
  *
  * Scale shape: token-df aggregation (one shuffle over distinct doc
  * tokens), per-doc prefix selection (one window over the exploded
  * tokens, keyed by doc), candidate generation (self-join on prefix
  * token — the bucket sizes are df-bounded), then exact Jaccard
  * verification only on candidates. Versus the O(n²) brute form, the
  * cross product never materializes; versus LSH, recall is exactly 1.
  *
  * Caveat: effectiveness depends on a heavy-tailed (Zipfian) vocabulary —
  * prefix tokens are each set's RAREST, so bucket sizes track the low end
  * of the df distribution. On a degenerate tiny-vocabulary corpus every
  * token is frequent and candidate buckets approach the cross product;
  * there the LSH path (approximate) or banded MinHash is the right tool.
  */
object SetSimJoin {

  /** All (id_a < id_b, jac) pairs with Jaccard(wset_a, wset_b) ≥ t.
    * Input: (idCol, textCol) rows; tokens are whitespace words. */
  def jaccardJoin(docs: DataFrame, t: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(t > 0.0 && t <= 1.0, "threshold must be in (0, 1]")
    // persist both reused tables: broadcast build sides cannot share
    // subtrees via exchange reuse (same pattern as the MinHash-LSH
    // signature persist) — without these the tokenize/df/window lineage
    // runs once per consumer
    val wsets = docs.select(col(idCol).as("id"),
        array_distinct(split(col(textCol), " ")).as("wset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = wsets.select(col("id"), size(col("wset")).as("n"),
      explode(col("wset")).as("tok"))
    val dfs = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // canonical rarest-first rank per doc; prefix keeps the first
    // n - ceil(t*n) + 1 tokens
    val w = Window.partitionBy(col("id")).orderBy(col("df").asc, col("tok").asc)
    val prefixes = toks.join(dfs, "tok")
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= col("n") - ceil(lit(t) * col("n")) + 1)
      .select(col("id"), col("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // explicit width on the candidate set (r17): it is the STREAMING side
    // of the verification joins, whose cost is pairs × set-intersection
    // work — AQE sizes the distinct's exchange by BYTES (KB here) and
    // coalesces it to ~one partition, serializing the quadratic verify
    // (user_behavior_simjoin 0.90 → 2.36 s when cached-plan coalescing
    // landed). An explicit repartition is never coalesced; the width is
    // the session's core count, the same 100 TB-safe clamp par() uses.
    val cands = prefixes.as("pa")
      .join(prefixes.as("pb"),
        col("pa.tok") === col("pb.tok") && col("pa.id") < col("pb.id"))
      .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"))
      .distinct()
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    cands
      .join(wsets.select(col("id").as("id_a"), col("wset").as("wa")), "id_a")
      .join(wsets.select(col("id").as("id_b"), col("wset").as("wb")), "id_b")
      .select(col("id_a"), col("id_b"), Dedup.jaccard(col("wa"), col("wb")).as("jac"))
      .filter(col("jac") >= t)
  }

  /** All DIRECTED (id_a ≠ id_b) pairs with containment
    * |A∩B| / |A| ≥ t — the asymmetric "doc A is an excerpt/quote of doc
    * B" detector symmetric Jaccard dilutes. Exact (recall 1), no cross
    * product.
    *
    * Prefix bound (PPJoin math, asymmetric form): containment ≥ t means
    * the overlap is ≥ ⌈t·|A|⌉ tokens; if none of A's rarest
    * `|A| − ⌈t·|A|⌉ + 1` tokens appeared in B, every shared token would
    * sit among A's last ⌈t·|A|⌉ − 1 tokens — too few. So candidates are
    * A-PREFIX tokens joined against the FULL inverted token index (the
    * B side has no prefix bound: a containing doc can hold A's rare
    * token anywhere). Bucket sizes are df-bounded; rare-first canonical
    * order keeps them small on any Zipfian vocabulary (same caveat as
    * [[jaccardJoin]] for degenerate tiny vocabularies).
    */
  def containmentJoin(docs: DataFrame, t: Double,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(t > 0.0 && t <= 1.0, "threshold must be in (0, 1]")
    val wsets = docs.select(col(idCol).as("id"),
        array_distinct(split(col(textCol), " ")).as("wset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = wsets.select(col("id"), size(col("wset")).as("n"),
      explode(col("wset")).as("tok"))
    val dfs = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("id")).orderBy(col("df").asc, col("tok").asc)
    val prefixes = toks.join(dfs, "tok")
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= col("n") - ceil(lit(t) * col("n")) + 1)
      .select(col("id"), col("tok"))
    val index = toks.select(col("id"), col("tok"))
    val cands = prefixes.as("pa")
      .join(index.as("pb"),
        col("pa.tok") === col("pb.tok") && col("pa.id") =!= col("pb.id"))
      .select(col("pa.id").as("id_a"), col("pb.id").as("id_b"))
      .distinct()
    cands
      .join(wsets.select(col("id").as("id_a"), col("wset").as("wa")), "id_a")
      .join(wsets.select(col("id").as("id_b"), col("wset").as("wb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("wa"), col("wb"))).cast("double")
          / size(col("wa")).cast("double")).as("containment"))
      .filter(col("containment") >= t)
  }
}
