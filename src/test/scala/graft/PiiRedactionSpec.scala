package graft

import graft.pipeline.PiiRedaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiRedactionSpec extends AnyFunSuite with SharedSpark {

  private def one(text: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    PiiRedaction.detect(Seq(text).toDF("t"), "t")
      .withColumn("clean", PiiRedaction.redact(col("t")))
      .select("n_emails", "n_phones", "n_ipv4", "clean")
      .collect().head
  }

  test("detects and redacts each PII class, leaves clean text alone") {
    val r = one("mail a.b+c@sub.example.org or x@y.io, call 555-123-4567, " +
      "host 192.168.0.1 done")
    assert(r.getLong(0) == 2 && r.getLong(1) == 1 && r.getLong(2) == 1)
    assert(r.getString(3) ==
      "mail [EMAIL] or [EMAIL], call [PHONE], host [IP] done")

    val clean = one("no pii here, just words and numbers like 42 or 3.14")
    assert(clean.getLong(0) == 0 && clean.getLong(1) == 0 && clean.getLong(2) == 0)
    assert(clean.getString(3) ==
      "no pii here, just words and numbers like 42 or 3.14")
  }

  test("replacement order: a phone-like digit run inside an email is not double-redacted") {
    // the email pattern consumes the whole address first; no [PHONE]
    // may appear inside the placeholder afterwards
    val r = one("reach 555-123-4567@example.com today")
    assert(r.getString(3) == "reach [EMAIL] today")
  }

  test("word boundaries: embedded digit runs match per \\b semantics") {
    val r = one("serial 1555-123-45678 and version 10.1.2.3.4")
    // no \b splits '1555' or '45678', so no phone match anywhere
    assert(r.getLong(1) == 0)
    // '.' is a non-word char, so the first four octets of a longer
    // dotted run DO match (the known conservative-over-match of
    // \b-anchored IPv4 regexes; Java and RE2 agree, which is the
    // contract that matters here)
    assert(r.getLong(2) == 1)
  }

  test("q78 over the fixture: injection makes every class non-vacuous") {
    val out = Queries.all("q78_pii_redaction")(spark, Sf0001)
    val agg = out.agg(
      sum("n_emails"), sum("n_phones"), sum("n_ipv4"), count(lit(1)))
      .collect().head
    assert(agg.getLong(0) >= 167 && agg.getLong(1) >= 125 && agg.getLong(2) >= 100)
    assert(agg.getLong(3) == 500)
    // doc 0 gets all three injections
    val d0 = out.filter(col("doc_id") === 0).collect().head
    assert(d0.getLong(1) == 1 && d0.getLong(2) == 1 && d0.getLong(3) == 1)
  }
}
