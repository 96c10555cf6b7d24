package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and scrubbing — the privacy-governance pass of a
  * training-data pipeline (north-star text-analysis family; the reference
  * has no text ops). Sits next to [[TextAnalysis]]'s digit redaction: that
  * is the blunt per-character tool, this is the class-aware one a data
  * card reports on (how MUCH of each PII class a source leaks) and an
  * export pipeline scrubs with.
  *
  * Engine-portability contract: patterns use only character classes,
  * counted repetition and grouping — no `\d`/`\b`/lookaround — so Java's
  * backtracking engine (Spark) and RE2-family engines (DuckDB) find the
  * SAME matches; `[.]` stands in for the escaped dot so the pattern
  * strings survive SQL-literal quoting untouched. Detection is
  * `regexp_extract_all(... , 0)` (full-match list) in both engines;
  * scrubbing is global `regexp_replace` (Spark is global by default,
  * DuckDB needs the 'g' flag — the oracle carries it).
  *
  * Scale: every column here is a per-row codegen'd expression — zero
  * shuffles for scrubbing; the report is ONE map-side-combinable
  * aggregation keyed by the grouping column.
  */
object Pii {

  /** user@host.tld — the host needs a dotted suffix of letters. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  /** Dotted quad (syntactic — 999.999.999.999 matches; detection for
    * scrubbing wants recall, octet-range pedantry belongs to validators). */
  val Ipv4Re = "[0-9]{1,3}([.][0-9]{1,3}){3}"
  /** NANP-style 555-123-4567. */
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Number of matches of `re` in `c` — full-match count, codegen'd. */
  def hitCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0)))

  /** Per-group PII exposure report: documents and occurrences per class —
    * the privacy row of a corpus data card. One aggregation; output is
    * |groups| rows at any corpus size. */
  def report(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(hitCount(t, EmailRe) > 0, 1L).otherwise(0L)).as("email_docs"),
        sum(hitCount(t, EmailRe).cast("long")).as("email_hits"),
        sum(hitCount(t, Ipv4Re).cast("long")).as("ipv4_hits"),
        sum(hitCount(t, PhoneRe).cast("long")).as("phone_hits"))
  }

  /** Class-tagged redaction: emails → `<EMAIL>`, then dotted quads →
    * `<IP>`, then phone numbers → `<PHONE>` — in that order, so an
    * address's dotted host is consumed by the email rule before the IP
    * rule can bite into it. Pure per-row expression. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Scrubbed copy of the corpus with before/after hit counts per row —
    * the export-side transform; `residual_hits` must be 0 for every class
    * (asserted by the gate: the oracle recomputes it). */
  def scrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val clean = redact(t)
    docs.withColumn("pii_hits",
        (hitCount(t, EmailRe) + hitCount(t, Ipv4Re) + hitCount(t, PhoneRe)).cast("long"))
      .withColumn(textCol, clean)
      .withColumn("residual_hits",
        (hitCount(col(textCol), EmailRe) + hitCount(col(textCol), Ipv4Re) +
          hitCount(col(textCol), PhoneRe)).cast("long"))
  }
}
