package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting — the join-side companion of
  * [[SaltedAgg]] (the reference has no joins at all; SURVEY.md §2.2 joins
  * row). For a shuffle join where a handful of hot probe keys would melt
  * single reducers, append a deterministic salt to the probe side and
  * explode the build side `saltBuckets`× so every (key, salt) pair lands on
  * its own reducer. Result is row-identical to the plain join.
  *
  * When to use which skew tool at 100 TB:
  *  - build side fits in memory → `broadcast()` (no shuffle at all);
  *  - both sides big, skew only at runtime → AQE skew-join splitting;
  *  - both sides big, skew known and extreme (power-law user ids) → this,
  *    which also de-skews the SHUFFLE WRITE of the probe side, something
  *    AQE's reducer-side splitting cannot do.
  *
  * The build side grows `saltBuckets`×, so pick the smallest bucket count
  * that flattens the hot keys (8-32 is typical).
  */
object SaltedJoin {

  /** @param salt deterministic per-row expression on the probe side with
    *             high cardinality (an id column, NOT rand() — reruns and
    *             retries must route rows identically). Routed through
    *             murmur `hash()` so any type works and null salts land in
    *             a bucket instead of nulling the join condition (which
    *             would silently DROP the row vs the plain join).
    */
  def join(probe: DataFrame, build: DataFrame, probeKey: String, buildKey: String,
      salt: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 2, "salting needs at least 2 buckets")
    val p = probe.withColumn("__salt_p", pmod(hash(salt), lit(saltBuckets)))
    val b = build.withColumn("__salt_b",
      explode(lit((0 until saltBuckets).toArray)))
    p.join(b, p("__salt_p") === b("__salt_b") && col(probeKey) === col(buildKey))
      .drop("__salt_p", "__salt_b")
  }
}
