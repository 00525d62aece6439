package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the privacy pass of a training-data
  * pipeline (strip emails/phones/IPs before a corpus ships to training,
  * and report what was found per document for audit). The reference has
  * no privacy surface; this extends its ingest path (SURVEY §2 Part B)
  * with the scrub step every large-corpus pipeline runs between raw
  * crawl and tokenization.
  *
  * Design constraints:
  *  - Row-local only: detection and redaction are per-document regexes —
  *    no shuffle anywhere; at 100 TB this is a map-only pass that scales
  *    linearly with input splits.
  *  - Cross-engine determinism: patterns use only regex constructs whose
  *    semantics agree between Java's engine (Spark) and RE2 (DuckDB
  *    oracle) — character classes, bounded repetition, ASCII `\b`; no
  *    lookaround, no backrefs, no Unicode classes.
  *  - Replacement ORDER is part of the contract: emails are rewritten
  *    before phones before IPs, so a pattern can never match inside an
  *    earlier placeholder.
  */
object PiiRedaction {

  /** The detector patterns, in replacement order. Scope is deliberately
    * conservative (pattern-identifiable PII): RFC-ish emails, NANP-style
    * `ddd[- ]ddd[- ]dddd` phone shapes, dotted-quad IPv4.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Per-row match counts for each PII class (long columns `n_emails`,
    * `n_phones`, `n_ipv4`).
    */
  def detect(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)).cast("long"))
    .withColumn("n_phones", regexp_count(col(textCol), lit(PhoneRe)).cast("long"))
    .withColumn("n_ipv4", regexp_count(col(textCol), lit(Ipv4Re)).cast("long"))

  /** Redacted text: every match replaced by its class placeholder, in
    * the documented order.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")

  /** Deterministic synthetic-PII injection, derived purely from fixture
    * columns (doc_id arithmetic), mirrored verbatim in the DuckDB
    * oracle. TEST PLUMBING, not an operator: the driver fixtures are
    * PII-free word salad, so without injection the redaction gate would
    * pass vacuously on any implementation including a broken one. Every
    * third doc gains an email, every fourth a phone, every fifth an
    * IPv4 (doc_id 0 gets all three).
    */
  def injectSyntheticPii(text: Column, id: Column): Column =
    concat(
      text,
      when(id % 3 === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@example.com")))
        .otherwise(""),
      when(id % 4 === 0,
        concat(lit(" call 555-"), lpad((id % 1000).cast("string"), 3, "0"),
          lit("-"), lpad(((id * 7) % 10000).cast("string"), 4, "0")))
        .otherwise(""),
      when(id % 5 === 0,
        concat(lit(" from 10."), (id % 256).cast("string"), lit(".0.1")))
        .otherwise(""))

  /** Q78: per-document PII audit over the documents fixture (with the
    * deterministic injection applied so the counts are non-trivial):
    * match counts per class plus the sha256 of the redacted text — the
    * hash pins the full rewritten string through the oracle without
    * shipping long text columns through the compare.
    */
  def q78(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    detect(
      d.select(col("doc_id"),
        injectSyntheticPii(col("text"), col("doc_id")).as("__t")), "__t")
      .withColumn("clean_sha", sha2(redact(col("__t")), 256))
      .select("doc_id", "n_emails", "n_phones", "n_ipv4", "clean_sha")
      .orderBy("doc_id")
  }
}
