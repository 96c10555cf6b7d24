package graft

import graft.store.VersionedStore
import org.apache.spark.sql.functions._

class VersionedStoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def stateMap(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("init + commits: every historical version reads back exactly") {
    val root = java.nio.file.Files.createTempDirectory("graftvs").toString
    VersionedStore.init(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("id", "x"), root)
    // v1: update 1, delete 2, insert 4
    VersionedStore.commit(Seq((1L, 11, false), (2L, 0, true), (4L, 40, false))
      .toDF("id", "x", "is_delete"), root)
    // v2: delete 4, re-insert 2
    VersionedStore.commit(Seq((4L, 0, true), (2L, 21, false))
      .toDF("id", "x", "is_delete"), root)
    assert(stateMap(VersionedStore.readAsOf(spark, root, 0, "id")) ===
      Map(1L -> 10, 2L -> 20, 3L -> 30))
    assert(stateMap(VersionedStore.readAsOf(spark, root, 1, "id")) ===
      Map(1L -> 11, 3L -> 30, 4L -> 40))
    assert(stateMap(VersionedStore.readAsOf(spark, root, 2, "id")) ===
      Map(1L -> 11, 2L -> 21, 3L -> 30))
  }

  test("checkpoint preserves state, bounds replay, and later deltas apply on top") {
    val root = java.nio.file.Files.createTempDirectory("graftvs2").toString
    VersionedStore.init(Seq((1L, 10), (2L, 20)).toDF("id", "x"), root)
    VersionedStore.commit(Seq((1L, 11, false)).toDF("id", "x", "is_delete"), root)
    val cp = VersionedStore.checkpoint(spark, root, "id")
    assert(cp === 2)
    assert(VersionedStore.versions(root) ===
      Seq((0, true), (1, false), (2, true)))
    // checkpoint state == pre-checkpoint state
    assert(stateMap(VersionedStore.readAsOf(spark, root, 2, "id")) ===
      stateMap(VersionedStore.readAsOf(spark, root, 1, "id")))
    VersionedStore.commit(Seq((2L, 0, true)).toDF("id", "x", "is_delete"), root)
    assert(stateMap(VersionedStore.readAsOf(spark, root, 3, "id")) ===
      Map(1L -> 11))
    // as-of BEFORE the checkpoint still replays from v0
    assert(stateMap(VersionedStore.readAsOf(spark, root, 0, "id")) ===
      Map(1L -> 10, 2L -> 20))
  }

  test("torn trailing manifest line is dropped; corrupt interior line raises") {
    val root = java.nio.file.Files.createTempDirectory("graftvs4").toString
    VersionedStore.init(Seq((1L, 10)).toDF("id", "x"), root)
    VersionedStore.commit(Seq((2L, 20, false)).toDF("id", "x", "is_delete"), root)
    val manifest = java.nio.file.Paths.get(root, "_manifest")
    // crash mid-append: version number written, kind lost
    java.nio.file.Files.writeString(manifest, "2",
      java.nio.file.StandardOpenOption.APPEND)
    assert(VersionedStore.versions(root) === Seq((0, true), (1, false)))
    assert(stateMap(VersionedStore.readAsOf(spark, root, 1, "id")) ===
      Map(1L -> 10, 2L -> 20))
    // a malformed line BEFORE committed history is corruption, not a tear
    java.nio.file.Files.writeString(manifest,
      "0 full\ngarbage here\n1 delta\n")
    val ex = intercept[IllegalStateException] {
      VersionedStore.versions(root)
    }
    assert(ex.getMessage.contains("corrupt manifest line"))
  }

  test("readAsOf below the first version raises") {
    val root = java.nio.file.Files.createTempDirectory("graftvs3").toString
    VersionedStore.init(Seq((1L, 10)).toDF("id", "x"), root)
    val ex = intercept[IllegalArgumentException] {
      VersionedStore.readAsOf(spark, root, -1, "id")
    }
    assert(ex.getMessage.contains("no versions"))
  }
}
