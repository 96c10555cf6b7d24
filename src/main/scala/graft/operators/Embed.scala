package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch text embedding via the hashing trick (feature hashing, Weinberger
  * et al. 2009) — the "DataFrame batch embedding" stage of the north star:
  * word w contributes sign(h(w)) to dimension h(w) mod d. Deterministic,
  * model-free, engine-portable (md5-derived hashes — the same primitive
  * the dedup operators use), and linear: explode + one groupBy shuffle.
  * A learned encoder drops in by replacing this stage; everything
  * downstream (index build, kNN, ANN) consumes the same vector column.
  */
object Embed {

  /** Sparse form (doc_id, idx, val) — the scalable representation; val is
    * an exact integer (sum of ±1 word contributions). */
  def featureHashSparse(docs: DataFrame, dim: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val h = Dedup.md5Int32(col("w"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .select(col(idCol), h.as("h"))
      .select(col(idCol),
        pmod(col("h"), lit(dim.toLong)).as("idx"),
        when(floor(col("h") / lit(dim.toDouble)).cast("long") % 2 === 0, 1L)
          .otherwise(-1L).as("sign"))
      .groupBy(col(idCol), col("idx"))
      .agg(sum(col("sign")).as("val"))
      .filter(col("val") =!= 0)
  }

  /** Dense form: ARRAY<FLOAT> of length `dim`, ready for Grid/Knn/Ann.
    * Every input doc yields a row — docs whose sparse form is empty (null
    * text, or all contributions cancel to 0) get the zero vector rather
    * than silently vanishing from downstream index/kNN stages. */
  def featureHashDense(docs: DataFrame, dim: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sparse = featureHashSparse(docs, dim, textCol, idCol)
    val entries = sparse.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("idx"), col("val")))).as("m"))
    docs.select(col(idCol)).distinct()
      .join(entries, Seq(idCol), "left")
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("float")).as("embedding"))
  }

  /** Per-label mean embedding, exploded to (label, dim_idx, centroid) —
    * the class-prototype statistic (nearest-centroid classifiers, drift
    * monitoring over embedding batches). One posexplode + one hash
    * aggregation keyed on (label, dim) — partial aggregation combines
    * map-side, so the shuffle carries ≤ |labels|·dim rows per task.
    *
    * Determinism (oracle parity): components are quantized to integer
    * micro-units (×1e6, round-half-away — Spark and DuckDB agree) before
    * the sum, so the cross-partition accumulation is exact integer
    * arithmetic; the single double division at the end is IEEE-identical
    * in both engines. */
  def labelCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("dim_idx", "comp")))
      .groupBy(col("label"), col("dim_idx"))
      .agg((sum(round(col("comp").cast("double") * 1000000.0).cast("long")).cast("double")
        / (lit(1000000.0) * count(lit(1)))).as("centroid"))
}
