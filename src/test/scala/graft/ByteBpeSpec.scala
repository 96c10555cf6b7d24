package graft

import graft.operators.ByteBpe
import org.apache.spark.sql.functions._

/** Byte-level BPE: byte symbolization parity (cluster vs driver mirror,
  * multibyte + supplementary-plane text), driver/distributed training
  * equality, and the no-OOV invariant the byte fallback exists for. */
class ByteBpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("toByteSymbols mirrors localByteSymbols incl. non-BMP text") {
    // "héllo" (2-byte é), "✓" (3-byte), "𝄞" (4-byte, supplementary plane —
    // the case that breaks UTF-16-unit string ops), plain ASCII
    val words = Seq("héllo", "✓ok", "𝄞clef", "plain")
    val got = words.toDF("word")
      .select(ByteBpe.toByteSymbols(col("word"))).as[String].collect()
    val expect = words.map(w => String.join(" ",
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02X"): _*))
    assert(got.toSeq == expect)
  }

  test("driver and distributed training paths learn identical merges") {
    val docs = Seq((1L, "héllo héllo héllo world"), (2L, "héllo world wörld"),
      (3L, "𝄞𝄞 𝄞𝄞 mix")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    val drv = rows(ByteBpe.train(docs, nMerges = 6))
    val dist = rows(ByteBpe.train(docs, nMerges = 6, driverDictLimit = 0))
    assert(drv == dist)
    assert(drv.size == 6)
    // most frequent adjacent byte pair: "héllo" x4 contributes (68,C3)x4 —
    // as does every other adjacent pair inside "héllo"; tie broken by
    // lowest (p1,p2) hex order. C3 A9 pairs appear in both héllo(4) and
    // wörld? no — ö is C3 B6. (6C,6C) "ll" only in héllo. Check the count
    // invariants rather than hand-ranking: every learned pair_count is
    // positive and non-increasing never ABOVE the first
    assert(drv.forall(_._4 > 0))
    assert(drv.forall(_._4 <= drv.head._4))
  }

  test("no OOV: with zero applicable merges n_tokens == n_bytes for any script") {
    // merges learned from ASCII-only corpus never match Cyrillic/emoji
    // bytes' first positions... train on one corpus, encode another
    val train = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val merges = ByteBpe.train(train, nMerges = 2).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val alien = Seq((10L, "привет 🌍")).toDF("doc_id", "text")
    val got = ByteBpe.encodeTokenCounts(alien, merges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // привет = 12 UTF-8 bytes, 🌍 = 4; "61 61"-family merges never apply
    assert(got == Seq((10L, 16L, 16L)))
  }

  test("merges compress: trained-corpus token count drops below byte count") {
    val docs = Seq((1L, "hello hello hello"), (2L, "hello help")).toDF("doc_id", "text")
    val out = ByteBpe.trainAndEncode(docs, nMerges = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (tok1, byt1) = out(1L)
    assert(byt1 == 15L)
    assert(tok1 < byt1)
  }
}
