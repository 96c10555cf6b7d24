package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pre-filtering (SURVEY.md §2.2 joins row, the scale
  * path): build a Bloom filter over the small side's join keys, broadcast
  * it, and drop big-side rows that cannot match BEFORE the shuffle. False
  * positives only cost bytes — the exact join still runs after — so the
  * result is bit-identical to the plain join (which is exactly what the
  * oracle checks).
  *
  * Spark-first construction, no UDFs anywhere:
  *  - build = per-row bit positions (native `xxhash64` double hashing) →
  *    `groupBy(word).agg(bit_or(...))` — map-side combinable, one tiny
  *    shuffle of ≤ numBits/64 rows, then a driver collect of the same;
  *  - probe = codegen'd shift/AND arithmetic against the bitset as an
  *    array literal (a 1M-bit filter is 128 KB — well under broadcast
  *    budgets; Spark's own `InjectRuntimeFilter` applies the same idea
  *    automatically when stats allow, this operator is the explicit form
  *    for when they don't).
  *
  * At 100 TB the win is shuffle bytes: a selective dimension (say 1% of
  * keys survive its filter) lets ~99% of the fact side short-circuit
  * map-side instead of shuffling.
  */
object Bloom {

  /** Bit positions for a key: double hashing h1 + i*h2 (Kirsch &
    * Mitzenmacher) over the native xxhash64 — deterministic, codegen'd. */
  private def positions(key: Column, numBits: Int, numHashes: Int): Seq[Column] = {
    // reduce both hashes into [0, numBits) BEFORE combining so the ANSI
    // 64-bit arithmetic can never overflow; h2 is forced ≥ 1 so the probe
    // sequence never degenerates to a single bit
    val h1 = pmod(xxhash64(key), lit(numBits.toLong))
    val h2 = pmod(xxhash64(key, lit(0x9E3779B9L)), lit(numBits.toLong - 1)) + lit(1L)
    (0 until numHashes).map(i => pmod(h1 + lit(i.toLong) * h2, lit(numBits.toLong)))
  }

  /** Build the bitset distributedly: explode each key's bit positions,
    * OR-combine per 64-bit word, collect the ≤ numBits/64 word rows. */
  def buildBits(keys: DataFrame, keyCol: String, numBits: Int = 1 << 20,
      numHashes: Int = 3): Array[Long] = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64: $numBits")
    val pos = keys
      .select(explode(array(positions(col(keyCol), numBits, numHashes): _*)).as("pos"))
    val words = pos
      .groupBy((col("pos") / 64L).cast("long").as("word"))
      .agg(bit_or(call_function("shiftleft", lit(1L), (col("pos") % 64L).cast("int"))).as("bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership probe as a pure Column expression over the bitset literal:
    * all numHashes bits set. Stays inside whole-stage codegen. */
  def mightContain(bits: Array[Long], numBits: Int, numHashes: Int)(key: Column): Column = {
    val bitsLit = lit(bits)
    positions(key, numBits, numHashes).map { p =>
      call_function("shiftright",
          element_at(bitsLit, (p / 64L).cast("int") + 1), (p % 64L).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Bloom-prefiltered inner equi-join: big-side rows failing the filter
    * never reach the join shuffle; survivors join exactly. Identical
    * result to `big.join(small, bigKey === smallKey)`. */
  def prefilterJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, numBits: Int = 1 << 20, numHashes: Int = 3): DataFrame = {
    // xxhash64 is TYPE-sensitive (an INT and a BIGINT holding the same
    // value hash differently) while the equi-join coerces types — a
    // mismatch would make the build and probe hash different bytes and
    // silently DROP matching rows. Fail loudly instead.
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    require(bigType == smallType,
      s"prefilterJoin key types must match exactly (xxhash64 is type-" +
        s"sensitive): $bigKey is $bigType, $smallKey is $smallType — " +
        "cast one side before calling")
    val bits = buildBits(small.select(col(smallKey)).distinct(), smallKey, numBits, numHashes)
    big.filter(mightContain(bits, numBits, numHashes)(col(bigKey)))
      .join(small, col(bigKey) === col(smallKey))
  }
}
