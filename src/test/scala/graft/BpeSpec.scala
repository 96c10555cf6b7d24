package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("pair counts weight by word frequency") {
    // "ab" x3, "ba" x1 -> pairs: (a,b)=3, (b,a)=1
    val docs = Seq((1L, "ab ab ba"), (2L, "ab")).toDF("doc_id", "text")
    val wf = Bpe.wordFreq(docs).select(Bpe.toSymbols(col("word")).as("sym"), col("freq"))
    val got = Bpe.pairCounts(wf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", "b") -> 3L, ("b", "a") -> 1L))
  }

  test("merge application is greedy left-to-right, non-overlapping (aaa case)") {
    // word "aaa": pairs (a,a)=2 -> merge (a,a); applying to ' a a a '
    // must yield ' aa a ' (NOT ' aa aa ' or ' a aa '), so round 2 sees
    // (aa,a)=1
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges(0) == ((1, "a", "a", 2L)))
    assert(merges(1) == ((2, "aa", "a", 1L)))
  }

  test("ties break by (count DESC, p1 ASC, p2 ASC)") {
    // "xy" and "xz" both once: (x,y)=1 (x,z)=1 -> (x,y) wins on p2
    val docs = Seq((1L, "xy xz")).toDF("doc_id", "text")
    val m = Bpe.train(docs, nMerges = 1).collect().head
    assert((m.getString(1), m.getString(2)) == (("x", "y")))
  }

  test("learned merges chain into multi-character tokens") {
    // "abab" x2: (a,b)=4 -> ab; then ' ab ab ' -> (ab,ab)=2 -> abab
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, nMerges = 2).collect()
      .map(r => (r.getString(3), r.getLong(4)))
    assert(merges.toSeq == Seq(("ab", 4L), ("abab", 2L)))
  }

  test("encode reports post-merge token counts per document") {
    val docs = Seq((1L, "abab cd"), (2L, "abab abab")).toDF("doc_id", "text")
    // trained on this corpus (2 merges): ab then abab; doc1 = [abab]=1 tok
    // + [c,d]=2 toks (cd merges only if learned; (c,d)=1 < (ab,ab)=3);
    // doc2 = 2 words x 1 tok
    val got = Bpe.trainAndEncode(docs, nMerges = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 3L, 6L), (2L, 2L, 8L)))
  }

  test("fertilityByGroup: per-group tokens/word and chars/token under the merges") {
    // merges (2): ab, then abab. src A: "abab cd" -> toks [abab]=1 + [c,d]=2
    // over 2 words, 6 chars; src B: "abab abab" -> 2 toks, 2 words, 8 chars
    val docs = Seq((1L, "abab cd", "A"), (2L, "abab abab", "B"))
      .toDF("doc_id", "text", "source")
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val got = Bpe.fertilityByGroup(docs, merges, "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    assert(got == Set(
      ("A", 2L, 3L, 1.5, 2.0),     // 3 toks / 2 words; 6 chars / 3 toks
      ("B", 2L, 2L, 1.0, 4.0)))    // 2 toks / 2 words; 8 chars / 2 toks
  }

  test("a run of repeats merges canonically within one iteration (aaaa case)") {
    // [a,a,a,a] under (a,a): left fold gives [aa,aa] — the new token never
    // pairs with the symbol that created it in the same pass
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = Bpe.trainAndEncode(docs, nMerges = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 4L)))
  }

  test("driver trainer == distributed dictionary loop, merge for merge") {
    val docs = Seq(
      (1L, "the theme there then the"), (2L, "other mother the bother"),
      (3L, "aaa abab xy xz aaaa"), (4L, "the then there other")).toDF("doc_id", "text")
    val driver = Bpe.train(docs, nMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val dist = Bpe.train(docs, nMerges = 6, driverDictLimit = 0).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(driver.toSeq == dist.toSeq)
  }

  test("incremental driver trainer == naive full-recount, 120 merges on a random dictionary") {
    // the r12 incremental pair-count maintenance must learn the EXACT
    // merge sequence the straightforward recount-every-iteration loop
    // learns — counts, picks, and tie-breaks included. ASCII-only words so
    // String ordering == code-point ordering in the in-test reimplementation.
    val rnd = new scala.util.Random(123)
    val alpha = "abcdef"
    val words = (0 until 400).map { _ =>
      (0 until (3 + rnd.nextInt(8))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(5))(w)).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val nMerges = 120
    // naive reference: full recount every iteration, canonical left fold
    def applyM(syms: Vector[String], p1: String, p2: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (out, x) =>
        if (out.nonEmpty && out.last == p1 && x == p2) out.init :+ (p1 + p2)
        else out :+ x
      }
    val wf = text.split(" ").filter(_.nonEmpty).groupBy(identity)
      .map { case (w, g) => (w, g.length.toLong) }.toSeq
    var dict = wf.map { case (w, f) => (w.split("").filter(_.nonEmpty).toVector, f) }
    val expect = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      dict.foreach { case (syms, f) =>
        syms.sliding(2).foreach { case Seq(a, b) =>
          counts.update((a, b), counts.getOrElse((a, b), 0L) + f)
        case _ => }
      }
      if (counts.nonEmpty) {
        val ((p1, p2), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        expect += ((i, p1, p2, cnt))
        dict = dict.map { case (syms, f) => (applyM(syms, p1, p2), f) }
      }
    }
    val got = Bpe.train(docs, nMerges).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == expect.result(), "incremental trainer diverged from the recount reference")
  }

  test("batched distributed trainer == per-merge distributed loop == driver trainer (r13)") {
    // batchTopK=1 reproduces the pre-r13 argmax-of-1 loop exactly;
    // the default batched path must learn the identical merge sequence
    val docs = Seq(
      (1L, "the theme there then the"), (2L, "other mother the bother"),
      (3L, "aaa abab xy xz aaaa"), (4L, "the then there other"),
      (5L, "banana bandana cabana"), (6L, "mississippi missive miss")).toDF("doc_id", "text")
    def run(topK: Int) = Bpe.train(docs, nMerges = 10, driverDictLimit = 0,
        batchTopK = topK).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val batched = run(512)
    assert(batched == run(1))
    assert(batched == Bpe.train(docs, nMerges = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq)
  }

  test("selectBatch accumulates the created-pair bound as a SUM over members (r13 review)") {
    // Two admitted members can both grow the pair of their merged tokens
    // (post <= 4*min(nbr_i, nbr_j)), so the safe admission bound is
    // sum(2*nbr_i), not max(2*nbr_i). With floor=10 and no visible
    // neighbors, nbr_i = 10 per member: after two members the sum bound is
    // 40 — a third pick with count 30 must be REFUSED (under the old max
    // bound of 20 it was admitted, and a doubly-grown pair could
    // sequentially outrank it).
    val ranked = Array(("a", "b", 100L), ("r", "s", 90L), ("x", "y", 30L))
    val got = graft.operators.Bpe.selectBatch(ranked, floor = 10L, maxN = 512)
    assert(got == Seq(("a", "b", 100L), ("r", "s", 90L)))
    // counts strictly above the accumulated sum keep batching
    val ranked2 = Array(("a", "b", 100L), ("r", "s", 90L), ("x", "y", 41L))
    assert(graft.operators.Bpe.selectBatch(ranked2, floor = 10L, maxN = 512)
      == ranked2.toSeq)
  }

  test("batched trainer == sequential on random corpora (5 trials), incl. small topK slices") {
    val rnd = new scala.util.Random(77)
    val alpha = "abcdefgh"
    for (trial <- 1 to 5) {
      val words = (0 until 120).map { _ =>
        (0 until (2 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w)).mkString(" ")
      val docs = Seq((1L, text)).toDF("doc_id", "text")
      // a SMALL slice raises the floor, so the guard must stay sound when
      // most of the count table is invisible
      val topK = Seq(512, 8)(trial % 2)
      val batched = Bpe.train(docs, 15, driverDictLimit = 0, batchTopK = topK)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
      val seqtl = Bpe.train(docs, 15, driverDictLimit = 0, batchTopK = 1)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(batched == seqtl, s"trial $trial topK=$topK")
    }
  }

  test("one-pass multi-merge fold == iterated single-merge folds for disjoint merge sets") {
    val rnd = new scala.util.Random(55)
    val alpha = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val runs = (0 until 40).map { _ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString(" ")
    }
    // disjoint merge batch over distinct symbols: (a,b), (c,d), (e,e)
    val batch = Seq(("a", "b"), ("c", "d"), ("e", "e"))
    val df = runs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "sym")
    val onePass = df.select(col("id"), Bpe.applyMerges(col("sym"), batch).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val iterated = df.select(col("id"),
        batch.foldLeft(col("sym")) { case (c, (p1, p2)) => Bpe.applyMerge(c, p1, p2) }.as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(onePass == iterated)
  }

  test("corpus with no adjacent pairs trains zero merges; encode still counts tokens") {
    // every word is a single char -> no pairs -> empty merge table; the
    // nMerges=3 request must not loop or throw
    val docs = Seq((1L, "a b c"), (2L, "d")).toDF("doc_id", "text")
    assert(Bpe.train(docs, nMerges = 3).collect().isEmpty)
    val enc = Bpe.trainAndEncode(docs, nMerges = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(enc == Set((1L, 3L, 3L), (2L, 1L, 1L)))
  }
}
