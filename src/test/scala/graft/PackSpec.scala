package graft

import graft.operators.Pack
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpecBase {
  import spark.implicits._

  /** Driver-side reference fold: greedy packing in id order per group. */
  private def referencePack(rows: Seq[(Long, Long)], capacity: Long,
      numGroups: Int): Seq[(Long, Long, Long, Long, Long)] =
    rows.map { case (id, tok) => (id % numGroups, id, tok) }
      .groupBy(_._1).toSeq.flatMap { case (grp, docs) =>
        var bin = 0L; var fill = 0L
        docs.sortBy(_._2).zipWithIndex.map { case ((g, id, tok), i) =>
          if (i == 0) { bin = 0; fill = tok }
          else if (fill + tok > capacity) { bin += 1; fill = tok }
          else fill += tok
          (g, id, tok, bin, fill)
        }
      }.sortBy(_._2)

  test("greedyPack matches the sequential reference fold on random sizes") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 400L).map(id => (id, 1L + rnd.nextInt(200).toLong))
    val got = Pack.greedyPack(rows.toDF("doc_id", "tok"), "doc_id", "tok",
        capacity = 256L, numGroups = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._2).toSeq
    assert(got == referencePack(rows, 256L, 4))
  }

  test("bins never exceed capacity unless a single doc is oversized") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map(id => (id, 1L + rnd.nextInt(300).toLong))
    val packed = Pack.greedyPack(rows.toDF("doc_id", "tok"), "doc_id", "tok",
      capacity = 200L, numGroups = 3)
    val binTotals = packed.groupBy(col("grp"), col("bin_idx"))
      .agg(sum(col("n_tokens")).as("tot"), count(lit(1)).as("n"))
      .collect()
    binTotals.foreach { r =>
      val tot = r.getLong(2); val n = r.getLong(3)
      assert(tot <= 200L || n == 1L, s"overfull multi-doc bin: $r")
    }
  }

  test("bin indices are contiguous from 0 within each group") {
    val rows = (0L until 100L).map(id => (id, 60L))
    val packed = Pack.greedyPack(rows.toDF("doc_id", "tok"), "doc_id", "tok",
      capacity = 128L, numGroups = 2)
    packed.groupBy(col("grp"))
      .agg(min(col("bin_idx")).as("mn"), max(col("bin_idx")).as("mx"),
        countDistinct(col("bin_idx")).as("nd"))
      .collect().foreach { r =>
        assert(r.getLong(1) == 0L)
        assert(r.getLong(3) == r.getLong(2) + 1L, s"gap in bin ids: $r")
      }
  }

  test("oversized doc occupies a bin alone and packing continues after it") {
    val rows = Seq((0L, 50L), (2L, 500L), (4L, 50L), (6L, 60L))
    val got = Pack.greedyPack(rows.toDF("doc_id", "tok"), "doc_id", "tok",
        capacity = 128L, numGroups = 1)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 0L, 50L), (2L, 1L, 500L), (4L, 2L, 50L), (6L, 2L, 110L)))
  }
}
