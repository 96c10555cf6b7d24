package graft

import graft.operators.Pii
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpecBase {
  import spark.implicits._

  test("hit counts per class match hand counts") {
    val rows = Seq(
      (1L, "alice@example.com and bob.c@x.org wrote"),
      (2L, "hosts 10.0.0.1 192.168.001.005 and 1.2.3.4"),
      (3L, "call 555-123-4567 or 555-000-1111"),
      (4L, "no identifiers here"),
      (5L, "mix a@b.co 7.7.7.7 111-222-3333")).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        Pii.hitCount(col("text"), Pii.EmailRe).as("e"),
        Pii.hitCount(col("text"), Pii.Ipv4Re).as("i"),
        Pii.hitCount(col("text"), Pii.PhoneRe).as("p"))
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2, 0, 0)))
    assert(got(2L) == ((0, 3, 0)))
    assert(got(3L) == ((0, 0, 2)))
    assert(got(4L) == ((0, 0, 0)))
    assert(got(5L) == ((1, 1, 1)))
  }

  test("redaction scrubs every class; email rule consumes dotted hosts before the IP rule") {
    val df = Seq(
      (1L, "mail bob@h1.example.com via 1.2.3.4 now"),
      // the host LOOKS like a dotted quad + tld: email-first ordering must
      // yield ONE <EMAIL>, not a mangled u@<IP>.com
      (2L, "ping u@1.2.3.4.com fast"),
      (3L, "dial 555-123-4567")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Pii.redact(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "mail <EMAIL> via <IP> now")
    assert(out(2L) == "ping <EMAIL> fast")
    assert(out(3L) == "dial <PHONE>")
  }

  test("scrub: pii_hits counted pre-redaction, residual_hits always zero") {
    val df = Seq(
      (1L, "x@y.io at 8.8.8.8 call 555-123-4567", "en", "s"),
      (2L, "clean", "en", "s")).toDF("doc_id", "text", "lang", "source")
    val out = Pii.scrub(df).select("doc_id", "pii_hits", "residual_hits")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((3L, 0L)))
    assert(out(2L) == ((0L, 0L)))
  }

  test("report: per-source docs and occurrences, zero-hit sources keep their row") {
    val df = Seq(
      (1L, "a@b.co and c@d.org", "en", "s1"),
      (2L, "1.2.3.4", "en", "s1"),
      (3L, "nothing", "en", "s2")).toDF("doc_id", "text", "lang", "source")
    val got = Pii.report(df).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(("s1", 2L, 1L, 2L, 1L, 0L), ("s2", 1L, 0L, 0L, 0L, 0L)))
  }
}
