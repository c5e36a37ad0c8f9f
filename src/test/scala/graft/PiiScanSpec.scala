package graft

import org.apache.spark.sql.functions._

import graft.textual.PiiScan

/** PII detection: known Luhn vectors, two-stage card validation, and
  * the detector counts on crafted text.
  */
class PiiScanSpec extends GraftSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(1).toDF("x").select(c).head()

  test("luhn: known-valid test numbers pass, off-by-one check digits fail") {
    // 4532015112830366 is the classic Luhn-valid Visa test vector
    assert(one(PiiScan.luhnValid16(lit("4532015112830366"))).getBoolean(0))
    assert(!one(PiiScan.luhnValid16(lit("4532015112830367"))).getBoolean(0))
    // a generated number with the computed check digit is always valid
    val base = "412345678901234"
    val sum = one(PiiScan.luhnSum15(lit(base))).getLong(0)
    val check = (10 - sum % 10) % 10
    assert(one(PiiScan.luhnValid16(lit(base + check))).getBoolean(0))
    assert(!one(PiiScan.luhnValid16(lit(base + ((check + 3) % 10)))).getBoolean(0))
  }

  test("detectors: counts on crafted text, validation filters candidates") {
    val t = lit("reach a@b.co or c.d+x@e-f.org, tel 555-0199 and 555-12345; " +
      "cards 4532015112830366 4532015112830367 and 1234 too short")
    assert(one(PiiScan.emailCount(t)).getLong(0) === 2L)
    // 555-12345 still CONTAINS a \b555-[0-9]{4} prefix match? No: \b
    // after the 4th digit fails inside a digit run, so only 555-0199
    assert(one(PiiScan.phoneCount(t)).getLong(0) === 1L)
    assert(one(PiiScan.cardValidCount(t)).getLong(0) === 1L,
      "two 16-digit candidates, one survives Luhn")
    assert(one(size(regexp_extract_all(t, lit(PiiScan.CardRe), lit(0)))).getInt(0) === 2)
  }

  test("redaction: all valid PII gone, unvalidated candidates untouched") {
    val rows = SparkEntry.queries("docs_pii_redact")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getLong(3) == 0L && r.getLong(4) == 1L),
      "emails/phones/valid cards redacted; the Luhn-invalid candidate survives by design")
  }

  test("query surface: every doc yields 1 email, 1 phone, 2 candidates, 1 valid") {
    val rows = SparkEntry.queries("docs_pii_scan")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L &&
      r.getLong(3) == 2L && r.getLong(4) == 1L),
      "the planted PII is found and the invalid card is rejected everywhere")
  }
}
