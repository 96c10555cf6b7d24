package graft

import graft.core.Tables
import graft.operators.Snapshot
import org.apache.spark.sql.functions._

/** Snapshot-algebra CRUD invariants mirroring the reference's
  * insert/delete/update tests (tests/test_kd_tree_database.py:20-94). */
class SnapshotSpec extends SparkSpecBase {

  private lazy val state = Tables.embeddings(spark, sfDir).cache()

  test("insert appends; count grows; old snapshot unchanged (immutability)") {
    val before = state.count()
    val inserts = state.limit(3).withColumn("vec_id", col("vec_id") + 1000000L)
    val after = Snapshot.insert(state, inserts)
    assert(after.count() === before + 3)
    assert(state.count() === before) // old snapshot untouched (tests:108-120)
  }

  test("delete removes exactly the matched ids; delete-then-count invariant (tests:30-52)") {
    val ids = state.filter(col("vec_id") % 7 === 0)
    val nDel = ids.count()
    val after = Snapshot.delete(state, ids, "vec_id")
    assert(after.count() === state.count() - nDel)
    assert(after.filter(col("vec_id") % 7 === 0).count() === 0)
  }

  test("update_position changes vector, keeps metadata (tests:79-94)") {
    val updates = state.filter(col("vec_id") === 3)
      .withColumn("embedding", concat(array(lit(9.0f)), slice(col("embedding"), 2, 63)))
    val after = Snapshot.updatePosition(state, updates, "vec_id", "embedding")
    assert(after.count() === state.count())
    val row = after.filter(col("vec_id") === 3).collect()(0)
    assert(row.getSeq[Float](row.fieldIndex("embedding")).head === 9.0f)
    val oldLabel = state.filter(col("vec_id") === 3).collect()(0).getInt(2)
    assert(row.getInt(2) === oldLabel)
  }

  test("update_metadata changes metadata, keeps vector") {
    val updates = state.filter(col("vec_id") === 5).select(col("vec_id"), lit(777).as("label"))
    val after = Snapshot.updateMetadata(state, updates, "vec_id", "label")
    val row = after.filter(col("vec_id") === 5).collect()(0)
    assert(row.getInt(row.fieldIndex("label")) === 777)
    val oldVec = state.filter(col("vec_id") === 5).collect()(0).getSeq[Float](1)
    assert(row.getSeq[Float](row.fieldIndex("embedding")) === oldVec)
    assert(after.filter(col("label") === 777).count() === 1)
  }

  test("upsert = replace matched + append new") {
    val upd = state.filter(col("vec_id") < 2).withColumn("label", lit(555))
      .unionByName(state.filter(col("vec_id") === 2).withColumn("vec_id", lit(5000000L)))
    val after = Snapshot.upsert(state, upd, "vec_id")
    assert(after.count() === state.count() + 1)
    assert(after.filter(col("label") === 555).count() === 2)
    assert(after.filter(col("vec_id") === 5000000L).count() === 1)
  }

  test("merge: matched+flag deletes, matched updates, unmatched inserts, unmatched+flag no-op") {
    val src = state.filter(col("vec_id") === 0).withColumn("is_delete", lit(true))
      .unionByName(state.filter(col("vec_id") === 1)
        .withColumn("label", lit(777)).withColumn("is_delete", lit(false)))
      .unionByName(state.filter(col("vec_id") === 2)
        .withColumn("vec_id", lit(6000000L)).withColumn("is_delete", lit(false)))
      .unionByName(state.filter(col("vec_id") === 3)
        .withColumn("vec_id", lit(7000000L)).withColumn("is_delete", lit(true)))
    val after = Snapshot.merge(state, src, "vec_id")
    assert(after.count() === state.count()) // -1 delete +1 insert
    assert(after.filter(col("vec_id") === 0).count() === 0)          // deleted
    assert(after.filter(col("vec_id") === 1).head().getAs[Int]("label") === 777) // updated
    assert(after.filter(col("vec_id") === 6000000L).count() === 1)   // inserted
    assert(after.filter(col("vec_id") === 7000000L).count() === 0)   // no-op
    assert(after.filter(col("vec_id") === 3).count() === 1)          // untouched
  }

  test("merge: duplicated source id raises (SQL MERGE multi-match parity)") {
    // one id carrying both a delete and an update is ambiguous — SQL MERGE
    // errors; merge must too, not silently duplicate the key
    val src = state.filter(col("vec_id") === 1).withColumn("is_delete", lit(true))
      .unionByName(state.filter(col("vec_id") === 1)
        .withColumn("label", lit(888)).withColumn("is_delete", lit(false)))
    val ex = intercept[Exception] {
      Snapshot.merge(state, src, "vec_id").count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("more than once")), s"got: ${msgs(ex)}")
  }
}
