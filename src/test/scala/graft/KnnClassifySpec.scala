package graft

import graft.operators.KnnClassify

class KnnClassifySpec extends SparkSpecBase {
  import spark.implicits._

  test("leave-one-out 1-NN: self excluded, nearest neighbor's label predicted") {
    // queries (vec_id % 2 == 0): 0 -> NN 1 (label 1, correct),
    // 2 -> NN 3 (label 2, correct), 4 -> NN 5 at dist 25 < dist(4,3)=98.01
    // (label 1, WRONG vs true label 3)
    val db = Seq(
      (0L, Array(0.0f, 0.0f), 1),
      (1L, Array(0.1f, 0.0f), 1),
      (2L, Array(10.0f, 0.0f), 2),
      (3L, Array(10.1f, 0.0f), 2),
      (4L, Array(20.0f, 0.0f), 3),
      (5L, Array(25.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = KnnClassify.looAccuracy(db, dim = 2, queryMod = 2L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1, 1L, 1L), (2, 1L, 1L), (3, 1L, 0L)))
  }

  test("no rows pass the query gate -> empty result, no failure") {
    val db = Seq((1L, Array(0.0f), 7), (3L, Array(1.0f), 8))
      .toDF("vec_id", "embedding", "label")
    // queryMod 2 matches no odd ids
    assert(KnnClassify.looAccuracy(db, dim = 1, queryMod = 2L).collect().isEmpty)
  }

  test("distance ties break by ascending vec_id") {
    // 1 and 2 are equidistant from 0; the lower id (1, label 7) must win
    val db = Seq(
      (0L, Array(0.0f), 9),
      (1L, Array(1.0f), 7),
      (2L, Array(-1.0f), 8)
    ).toDF("vec_id", "embedding", "label")
    val got = KnnClassify.looAccuracy(db, dim = 1, queryMod = 100L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // only query is vec_id 0 (0 % 100 == 0): predicted label 7 != 9
    assert(got == Set((9, 1L, 0L)))
  }
}
