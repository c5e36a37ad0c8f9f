package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by dedup and text-analysis operators: tokenizing,
  * shingling, fingerprinting. All pure Catalyst expressions (codegen'd, no
  * UDFs) so they survive on a 100 TB scan.
  */
object TextFunctions {

  /** Explicit whitespace class: Java's \s includes \x0B but RE2's
    * (DuckDB's) does not — spelling the class out keeps every
    * token-derived oracle engine-equivalent on control-char text.
    */
  val wsPattern = "[ \\t\\n\\x0B\\f\\r]+"
  /** The same class in RE2 syntax for oracle SQL. */
  val wsPatternSql = "[ \\t\\n\\x0b\\f\\r]+"

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), wsPattern))

  /** "Not alphanumeric, not whitespace" — the whitespace class spelled
    * out for the same Java-vs-RE2 \s reason as [[wsPattern]] (Java's \s
    * matches \x0B; RE2's does not).
    */
  val punctClass = "[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]"
  /** The same class in RE2 syntax for oracle SQL. */
  val punctClassSql = "[^a-zA-Z0-9 \\t\\n\\x0b\\f\\r]"

  /** A BPE-ish sub-token split: runs of letters, runs of digits, or single
    * non-alphanumeric symbols (the usual pre-tokenizer shape for byte-pair
    * encoders). Counted with regexp_count — no materialized array needed.
    */
  val bpeTokenPattern = "[a-zA-Z]+|[0-9]+|" + punctClass
  /** The same alternation in RE2 syntax for oracle SQL. */
  val bpeTokenPatternSql = "[a-zA-Z]+|[0-9]+|" + punctClassSql

  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpeTokenPattern))

  /** Distinct word n-gram shingles ("a b c" strings). Fewer than n tokens →
    * empty array (guard matters: sequence(1, len-2) with len<3 would count
    * DOWN and explode).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val nShingles = size(toks) - (n - 1)
    val mk = transform(
      sequence(lit(1), nShingles),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    when(nShingles >= 1, array_distinct(mk)).otherwise(array().cast("array<string>"))
  }

  /** Jaccard similarity of two distinct-element arrays.
    * |A∪B| = |A|+|B|-|A∩B| — one intersect, no union materialization
    * (array_union builds a hash set per pair; sizes are free).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Distinct xxhash64 values of an array of shingle strings: set
    * operations on longs are several times cheaper than on strings, and
    * (collision probability ~n²/2^64) set sizes — hence Jaccard — are
    * preserved exactly.
    */
  def hashedSet(a: Column): Column = array_distinct(transform(a, s => xxhash64(s)))

  /** Polynomial rolling-hash fingerprint of the full text:
    * h = fold(chars, 0, (acc, c) -> (acc*31 + code(c)) mod 1_000_000_007).
    * Deterministic, engine-portable (the DuckDB oracle reproduces it with
    * list_reduce), and a stand-in for Rabin-Karp document fingerprinting.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(1000000007L))
}
