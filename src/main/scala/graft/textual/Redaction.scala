package graft.textual

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII masking for training-data pipelines: scrub personally
  * identifiable strings (phone numbers, emails, free digit runs) before
  * a corpus is retained or shipped to training. The reference corpus
  * carries author/contact metadata through ingestion untouched
  * (create_collections.py keeps raw page text); any pipeline operating
  * at corpus scale needs the inverse — deterministic, rule-ordered
  * masking as a narrow per-row projection.
  *
  * Engine-portability contract (this is what makes the op
  * oracle-checkable): patterns use only RE2-and-Java-common syntax —
  * explicit `[0-9]` classes, no `\d`, no backreferences, no lookaround —
  * and rules apply in declaration order, each replacing ALL matches
  * (Spark regexp_replace is replace-all by default; the DuckDB oracle
  * passes the 'g' flag). Order matters: phone masks run before the
  * bare-digit-run catch-all so a phone is "[PHONE]", not "[NUM]-[NUM]".
  *
  * Shape at 100 TB: a chain of codegen'd regexp_replace expressions —
  * pure map, no shuffle, pipelined inside whole-stage codegen with
  * whatever projection follows.
  */
object Redaction {

  /** (pattern, replacement), applied in order, all occurrences. */
  val defaultRules: Seq[(String, String)] = Seq(
    // TPC-H style international phone: CC-NNN-NNN-NNNN.
    "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}" -> "[PHONE]",
    // Email (conservative: no quoting, no IP literals).
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "[EMAIL]",
    // Any leftover digit run (account numbers, balances, ids).
    "[0-9]+" -> "[NUM]")

  /** Apply the rule chain to one column. */
  def maskPii(text: Column, rules: Seq[(String, String)] = defaultRules): Column =
    rules.foldLeft(text) { case (c, (pat, repl)) => regexp_replace(c, pat, repl) }

  /** The same chain as DuckDB SQL over a column expression (oracle
    * mirror — kept next to the rules so they cannot drift apart).
    */
  def maskPiiSql(colExpr: String, rules: Seq[(String, String)] = defaultRules): String =
    rules.foldLeft(colExpr) { case (e, (pat, repl)) =>
      s"regexp_replace($e, '$pat', '$repl', 'g')"
    }
}
