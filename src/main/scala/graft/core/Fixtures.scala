package graft.core

/** Deterministic, data-independent constants shared by the Spark queries and
  * the DuckDB oracle SQL (both are generated from these same arrays, so the
  * literals agree exactly).
  */
object Fixtures {
  /** Embedding dimensionality of the fixture `embeddings` table. */
  val Dim = 64

  /** Fixed query vector for single-query kNN — same value range as the
    * fixture embeddings (~[-0.3, 0.3]). */
  val Q64: Array[Double] = Array.tabulate(Dim)(i => math.sin(i + 1.0) * 0.2)

  /** Reciprocal diagonal of a synthetic covariance for Mahalanobis
    * (reference stores the reciprocal diagonal too:
    * vectordb/distance_metric.py:71-74). */
  val InvDiag64: Array[Double] = Array.tabulate(Dim)(i => 1.0 / (1.0 + 0.05 * i))

  /** English-ish stopword list for text analysis / language-ID heuristics. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Deterministic random hyperplanes for vector LSH (seeded; identical
    * doubles feed both the Spark expressions and the oracle SQL literals). */
  val Planes16: Array[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(16)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** Deterministic seeds for the TRAINED product quantizer — 16 subspaces
    * × 32 codewords × 4 dims, scaled into the fixture data range. The
    * literals feed both [[graft.operators.Pq.trainSeededExact]] and the
    * oracle's SQL replay of the training loop. */
  val PqSeeds: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(13)
    Array.fill(16)(Array.fill(32)(Array.fill(4)(rnd.nextGaussian() * 0.1)))
  }

  /** Deterministic SPD inverse covariance over the first 8 dims, row-major
    * flattened — the full-matrix Mahalanobis demo (reference supports full
    * covariance via np.linalg.solve per pair, distance_metric.py:78-80; we
    * pre-build the inverse once, driver-side). Sinv = A'A + I. */
  val InvFull8: Array[Double] = {
    val n = 8
    val rnd = new scala.util.Random(11)
    val a = Array.fill(n, n)(rnd.nextGaussian() * 0.3)
    val s = Array.ofDim[Double](n * n)
    for (i <- 0 until n; j <- 0 until n) {
      var acc = 0.0
      var k = 0
      while (k < n) { acc += a(k)(i) * a(k)(j); k += 1 }
      s(i * n + j) = acc + (if (i == j) 1.0 else 0.0)
    }
    s
  }
}
