package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CRUD as snapshot algebra over immutable DataFrames — the batch
  * re-expression of the reference's mutating API
  * (insert: vectordb/kd_tree_database.py:262-270, delete: :278-283,
  * update_position: :310-316, update_metadata: :324-328). Each op produces a
  * NEW state DataFrame; the old snapshot stays valid, which also gives the
  * reference's copy/immutability semantics (SURVEY.md §1.2) for free.
  *
  * Scale notes: deletes/upserts are key joins — Spark broadcasts the
  * (small) mutation batch automatically under AQE, so the 100 TB state side
  * never shuffles; inserts are a pure union (no shuffle at all).
  */
object Snapshot {

  /** Batch insert = append. Caller assigns ids (monotonic id assignment for
    * parity with the reference's counter: `row_number() + max(existing)`). */
  def insert(state: DataFrame, rows: DataFrame): DataFrame =
    state.unionByName(rows)

  /** Batch delete by id. */
  def delete(state: DataFrame, ids: DataFrame, idCol: String): DataFrame =
    state.join(ids.select(idCol).distinct(), Seq(idCol), "left_anti")

  /** Upsert: rows in `updates` replace same-id rows in `state`, new ids
    * append. */
  def upsert(state: DataFrame, updates: DataFrame, idCol: String): DataFrame =
    state.join(updates.select(idCol).distinct(), Seq(idCol), "left_anti")
      .unionByName(updates)

  /** update_position: replace only the vector column for matched ids,
    * keeping all other (metadata) columns from the old state — anti-join out
    * the old rows, union the updated rows carrying old metadata
    * (SURVEY.md §2.1 #5).
    *
    * `strict = true` matches the reference contract of FAILING on an
    * unknown id (kd_tree_database.py:313-315: `.get(id)` yields None and
    * the `.metadata` access raises AttributeError) — implemented as a lazy
    * plan-side assertion (left-join existence probe + `assert_true`
    * filter, the [[graft.index.Grid.requireDim]] pattern), so the check
    * costs no eager driver job and fires at action time, distributed.
    * The default stays the lenient no-op for pipeline use, where a
    * missing id usually means an already-deleted row. */
  def updatePosition(state: DataFrame, updates: DataFrame, idCol: String,
      vecCol: String, strict: Boolean = false): DataFrame = {
    val ups =
      if (!strict) updates
      else updates
        .join(state.select(col(idCol), lit(1).as("__exists")), Seq(idCol), "left")
        .filter(coalesce(
          assert_true(col("__exists").isNotNull,
            lit(s"update_position: unknown $idCol (reference raises, " +
              "kd_tree_database.py:313-315; pass strict=false to no-op)")),
          lit(true)))
        .drop("__exists")
    val replaced = state
      .join(ups.select(col(idCol), col(vecCol).as("__new_vec")), Seq(idCol), "inner")
      .withColumn(vecCol, col("__new_vec"))
      .drop("__new_vec")
    state.join(ups.select(idCol), Seq(idCol), "left_anti")
      .unionByName(replaced.select(state.columns.map(col).toSeq: _*))
  }

  /** MERGE: one-pass conditional upsert+delete (the SQL MERGE shape).
    * `source` carries full-width rows plus a boolean `deleteFlag` column:
    * matched + flag → row deleted; matched + !flag → row replaced by the
    * source row; unmatched + !flag → inserted; unmatched + flag → no-op.
    * One anti-join (mutation batch broadcasts under AQE) + one union —
    * the 100 TB state side never shuffles.
    *
    * Like SQL MERGE, a source id may appear AT MOST ONCE: a duplicated id
    * (e.g. a delete plus an update of the same key in one batch) is
    * ambiguous and raises at runtime rather than silently duplicating the
    * key in the result. The check is a window count over the (small) source
    * batch only — the state side is untouched. */
  def merge(state: DataFrame, source: DataFrame, idCol: String,
      deleteFlag: String = "is_delete"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val checked = source
      .withColumn("__src_n", count(lit(1)).over(Window.partitionBy(col(idCol))))
      .withColumn(idCol,
        when(col("__src_n") > 1, raise_error(concat(
          lit(s"Snapshot.merge: source id appears more than once (id="),
          col(idCol).cast("string"),
          lit("); SQL MERGE multi-match is ambiguous — dedup the batch first"))))
          .otherwise(col(idCol)))
      .drop("__src_n")
    val applied = checked.filter(!col(deleteFlag)).drop(deleteFlag)
    state.join(checked.select(idCol).distinct(), Seq(idCol), "left_anti")
      .unionByName(applied)
  }

  /** update_metadata: left join + coalesce, vector untouched
    * (SURVEY.md §2.1 #6). `updates` has (id, metaCol). */
  def updateMetadata(state: DataFrame, updates: DataFrame, idCol: String, metaCol: String): DataFrame = {
    val u = updates.select(col(idCol), col(metaCol).as("__new_meta"))
    state.join(u, Seq(idCol), "left")
      .withColumn(metaCol, coalesce(col("__new_meta"), col(metaCol)))
      .drop("__new_meta")
      .select(state.columns.map(col).toSeq: _*)
  }

  /** Snapshot diff (the CDC read side of the algebra): compare two states
    * keyed by `idCol` and emit one row per changed key with
    * op ∈ {I (insert), D (delete), U (update)} — U when any of
    * `compareCols` differs (null-safe). Unchanged keys are dropped.
    *
    * One full-outer key join — both sides shuffle-partition on the id, and
    * at 100 TB a bucketed/cell-partitioned store makes it co-located.
    * Emits (op, id); joining the id back against `after` (I/U) or `before`
    * (D) yields a full changelog that [[merge]] can replay. */
  def diff(before: DataFrame, after: DataFrame, idCol: String,
      compareCols: Seq[String]): DataFrame = {
    val b = before.select(col(idCol).as("__b_id") +:
      compareCols.map(c => col(c).as(s"__b_$c")): _*)
    val a = after.select(col(idCol).as("__a_id") +:
      compareCols.map(c => col(c).as(s"__a_$c")): _*)
    val changed = compareCols
      .map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    b.join(a, col("__b_id") === col("__a_id"), "full_outer")
      .withColumn("op",
        when(col("__b_id").isNull, lit("I"))
          .when(col("__a_id").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(col("op"), coalesce(col("__a_id"), col("__b_id")).as(idCol))
  }

  /** Slowly-changing-dimension Type 2 history from a change log: per key,
    * collapse consecutive repeats of `attrCol` and emit validity intervals
    * [valid_from, valid_to) with `is_current = 1` on the open last row —
    * the warehouse-dimension read side of the mutation algebra (the
    * reference keeps only latest state, vectordb/kd_tree_database.py:324-328;
    * SCD2 keeps the full timeline).
    *
    * Two windows over the SAME (key, order) partitioning — one shuffle
    * total, then per-partition sorts; events for one key co-locate, so at
    * 100 TB this scales with the largest single key's history, not the
    * table. Ordering is total via the (tsCol, tieCol) pair, so intervals
    * are deterministic under duplicate timestamps. */
  def scd2(log: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changes = log
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // keep change points: first row per key, or attribute differs from
      // the previous row NULL-SAFELY (lag(attr).isNull would conflate
      // "first row" with "previous attr was NULL" and emit spurious
      // intervals for consecutive NULL attribute values)
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    val wc = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wc))
      .withColumn("is_current", when(col("valid_to").isNull, 1).otherwise(0))
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("is_current"))
  }
}
