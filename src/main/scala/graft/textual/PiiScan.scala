package graft.textual

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection — the scrubbing pass a training-data pipeline runs
  * before anything leaves the corpus (emails, phone numbers, payment
  * card numbers). Detection is regex candidates + a VALIDATION step
  * where one exists: card candidates must pass the Luhn mod-10 check
  * (ISO/IEC 7812), which kills most random 16-digit false positives —
  * the standard two-stage shape of production scrubbers.
  *
  * Pure column expressions (codegen'd, scan-parallel — the 100 TB
  * posture is trivially map-only), and every regex/arithmetic step is
  * expressible 1:1 in the DuckDB oracle (patterns restricted to the
  * Java-regex ∩ RE2 common subset: character classes, bounded repeats,
  * `\b` word boundaries — no backrefs or lookarounds).
  */
object PiiScan {

  /** Conservative email shape (common-subset regex). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style 555 exchange used by the fixtures' planted numbers. */
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** 16-digit card candidate (validation separates real from noise). */
  val CardRe = "\\b[0-9]{16}\\b"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long")

  /** Luhn mod-10 over a 16-char digit string: 1-based position i from
    * the LEFT is doubled when i is odd (= even position from the
    * right for length 16), doubled digits > 9 drop 9; valid iff the
    * sum ≡ 0 (mod 10). Index order fixed — the oracle replays the
    * identical fold.
    */
  def luhnValid16(c: Column): Column =
    (aggregate(sequence(lit(1), lit(16)), lit(0L), (acc, i) => {
      val d = (ascii(c.substr(i, lit(1))) - lit(48)).cast("long")
      val dbl = d * 2
      acc + when(i % 2 === 1, when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
    }) % 10) === 0

  /** Luhn digit-sum of the FIRST 15 digits (the generator's half: the
    * check digit that makes the 16-digit number valid is
    * (10 − sum15 mod 10) mod 10).
    */
  def luhnSum15(c: Column): Column =
    aggregate(sequence(lit(1), lit(15)), lit(0L), (acc, i) => {
      val d = (ascii(c.substr(i, lit(1))) - lit(48)).cast("long")
      val dbl = d * 2
      acc + when(i % 2 === 1, when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
    })

  /** Count of Luhn-VALID 16-digit candidates in the text. */
  def cardValidCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(CardRe), lit(0)),
      c => luhnValid16(c))).cast("long")
}
