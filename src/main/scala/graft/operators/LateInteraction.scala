package graft.operators

import graft.functions.Distances
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ColBERT-style late-interaction scoring over PACKED multi-vector
  * embeddings: a dim-d stored vector is viewed as `nSub` contiguous
  * sub-vectors ("token embeddings") of width d/nSub, and the relevance of
  * a document to a query is MaxSim — for each query sub-vector take the
  * best-matching document sub-vector by dot product, then sum the maxima:
  *
  *     score(q, doc) = Σ_i max_j  dot(q_i, doc_j)
  *
  * This is the retrieval model of late-interaction rankers (one vector
  * per token, interaction deferred to scoring) expressed over the flat
  * `ARRAY<FLOAT>` storage the rest of the engine uses — no nested-array
  * schema change, no explode. The reference's kNN operator
  * (vectordb/kd_tree_database.py:285-304) scores whole vectors only;
  * MaxSim is the multi-vector generalization a passage-retrieval
  * deployment runs on the same corpus layout.
  *
  * Scale shape: per-row expression only (nSub² unrolled dot products of
  * width d/nSub — the SAME multiply count as nSub full-width distances),
  * fully whole-stage-codegen'd, ZERO shuffles before the final top-k,
  * which plans as TakeOrderedAndProject. Each sub-dot is rounded to 9
  * decimals before max/sum so the score — max and sum of identical
  * doubles — is bit-equal cross-engine.
  */
object LateInteraction {

  /** MaxSim score of the packed vector column `v` against packed literal
    * query `q`, both split into `nSub` equal-width sub-vectors.
    * Requires q.length % nSub == 0. */
  def maxSimLit(v: Column, q: Array[Double], nSub: Int): Column = {
    require(q.length % nSub == 0, s"dim ${q.length} not divisible by $nSub")
    val w = q.length / nSub
    val offsets = (0 until nSub).map(_ * w)
    val maxima = (0 until nSub).map { i =>
      val qi = q.slice(i * w, i * w + w)
      val dots = offsets.map { o =>
        round(Distances.dotLitOffsetUnrolled(v, qi, o), 9)
      }
      if (dots.size == 1) dots.head else greatest(dots: _*)
    }
    maxima.reduce(_ + _)
  }

  /** Column-vs-column MaxSim — the batch (join) form: score a packed
    * query-vector COLUMN against a packed document-vector column, both
    * split into `nSub` sub-vectors of width dim/nSub, same rounding
    * contract as [[maxSimLit]]; used under a broadcast query × corpus
    * join + the bounded KnnTopK aggregator. Implemented as the fused
    * kernel expression ([[graft.functions.VecMaxSimCols]]) — identical
    * arithmetic/rounding to the former unrolled-Column tree (pinned in
    * LateInteractionSpec), ~7× faster per pair: the old ~dim·nSub-node
    * codegen method blew JIT inlining budgets.
    *
    * Null contract (STRICTER than the pre-r10 unrolled form, which
    * partially evaluated malformed rows through element_at/greatest
    * null-skipping): NULL when either array is null, shorter than `dim`,
    * or carries a null element — the Vec* expression family's contract;
    * malformed vectors surface as null scores instead of silently scoring
    * a partial prefix. Pinned in LateInteractionSpec. */
  def maxSimCols(qv: Column, dv: Column, dim: Int, nSub: Int): Column = {
    require(dim % nSub == 0, s"dim $dim not divisible by $nSub")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.VecMaxSimCols(
      ColumnBridge.expression(qv), ColumnBridge.expression(dv), dim, nSub))
  }

  /** The pre-r10 unrolled-Column formulation, kept as the spec reference
    * for [[maxSimCols]] (bit-equality pinned in LateInteractionSpec). */
  private[graft] def maxSimColsUnrolled(qv: Column, dv: Column, dim: Int, nSub: Int): Column = {
    require(dim % nSub == 0, s"dim $dim not divisible by $nSub")
    val w = dim / nSub
    (0 until nSub).map { i =>
      val dots = (0 until nSub).map { j =>
        round(Distances.dotColsOffsetUnrolled(qv, dv, w, i * w, j * w), 9)
      }
      if (dots.size == 1) dots.head else greatest(dots: _*)
    }.reduce(_ + _)
  }
}
