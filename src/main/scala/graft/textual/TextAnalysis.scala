package graft.textual

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All are
  * narrow, codegen'd per-row transforms — the ideal 100 TB shape (no
  * shuffle at all until a downstream aggregation).
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the n-gram/stopword-overlap
    * language-ID heuristic. Deterministic and engine-portable (the DuckDB
    * oracle uses the same lists).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不"))

  /** Occurrence count of any word from `words` among the text's tokens. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** Predicted language: argmax stopword hits, ties broken by language
    * code (alphabetical), all-zero → "und" (undetermined).
    *
    * Single-pass native expression (LangIdExpr) — the composable form
    * re-tokenizes per language with interpreted lambdas. Callers must
    * have called [[graft.functions.TextExpressions.ensureRegistered]]
    * (or use [[langIdHof]], the pure-built-in equivalent).
    */
  def langId(text: Column): Column = graft.functions.TextExpressions.langId(text)

  /** Pure-built-in language ID (identical semantics to [[langId]]). */
  def langIdHof(text: Column): Column = {
    val ranked = stopwords.map(_._1).sorted.reverse.zipWithIndex.toMap
    val scoredRk = stopwords.map { case (lang, words) =>
      struct(stopwordHits(text, words).as("hits"), lit(ranked(lang)).as("rk"), lit(lang).as("lang"))
    }
    val best = array_max(array(scoredRk: _*))
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Per-document quality features + a composite score in [0,1]:
    * token count, mean token length, distinct-token ratio, stopword ratio,
    * punctuation ratio — the length/punct/stopword heuristics of standard
    * pretraining-data quality filters.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // Tokenize ONCE: the raw tokens(t) expression is referenced by five
    // downstream features, and while codegen subexpression elimination
    // catches some duplicates, the HOF-heavy feature expressions fall
    // back to interpreted evaluation where each reference re-splits the
    // text. An explicit projection boundary materializes the array once
    // per row — CollapseProject will not inline a non-cheap alias that
    // is referenced more than once, so the boundary survives
    // optimization. (Measured ~25% off the sf0.1 quality_score row —
    // 1.7-1.9s → 1.2-1.65s steady-state via tools/TimeQuery; the
    // remaining cost is the interpreted HOF features themselves.)
    val withToks = df.withColumn("__q_toks", tokens(t))
    val toks = col("__q_toks")
    val nToks = size(toks).cast("double")
    val allStop = stopwords.flatMap(_._2)
    // Raw (unrounded) ratios: the composite score must be computed from
    // these, not the rounded display columns — combining 4-decimal-rounded
    // values lands exactly on round-half boundaries (e.g. 0.83635) where
    // engines disagree; raw ratios make boundary hits measure-zero.
    val rawDistinct = when(nToks === 0, 0.0).otherwise(size(array_distinct(toks)).cast("double") / nToks)
    val rawPunct = when(length(t) === 0, 0.0).otherwise(
      (length(t) - length(regexp_replace(t, punctClass, ""))).cast("double") /
        length(t).cast("double"))
    // Stable 4-decimal rounding: floor(v*1e4 + 0.5)/1e4 is the same IEEE
    // op sequence in every engine, so both sides land on the same side of
    // .xxxx5 boundaries. Built-in round() does NOT guarantee that: Spark
    // rounds the exact binary value (0.84024999... -> 0.8402) while
    // DuckDB rounds the scaled product (8402.5 -> 0.8403) — observed
    // divergence on a real fixture row.
    def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)).cast("double") / lit(10000.0)
    withToks.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_token_len",
        r4(when(nToks === 0, 0.0).otherwise(
          aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") / nToks)))
      .withColumn("distinct_ratio", r4(rawDistinct))
      .withColumn("stopword_ratio",
        r4(when(nToks === 0, 0.0).otherwise(
          size(filter(toks, x => x.isInCollection(allStop))).cast("double") / nToks)))
      .withColumn("punct_ratio", r4(rawPunct))
      .withColumn("quality_score",
        r4(least(lit(1.0), greatest(lit(0.0),
          lit(0.4) * least(col("n_tokens").cast("double") / lit(50.0), lit(1.0)) +
            lit(0.3) * rawDistinct +
            lit(0.3) * (lit(1.0) - rawPunct)))))
      .drop("__q_toks")
  }

  /** Gopher-style intra-document repetition signals (Rae et al. 2021,
    * "Scaling Language Models", §A1.1 repetition filters): the fraction
    * of word-bigram occurrences claimed by the single most frequent
    * bigram, and the fraction that are repeats of an earlier occurrence.
    * Template spam and boilerplate score high on both; the standard
    * pretraining filter drops documents above a threshold. Shape at
    * scale: explode → two hash aggregations keyed by (doc_id[, gram]) —
    * fully map-side-combinable, no window, no driver state. Documents
    * with fewer than two tokens have no bigrams and are omitted (same
    * contract as the DuckDB oracle's len(toks) >= 2 guard).
    */
  def repetitionSignals(df: DataFrame, textCol: String): DataFrame = {
    def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)).cast("double") / lit(10000.0)
    val per = df
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions.wordBigrams(col(textCol))).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("c"))
    per.groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_bigrams"),
        max(col("c")).as("top_c"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_c"))
      .select(col("doc_id"), col("n_bigrams"),
        r4(col("top_c").cast("double") / col("n_bigrams").cast("double")).as("top_bigram_frac"),
        r4(col("dup_c").cast("double") / col("n_bigrams").cast("double")).as("dup_bigram_frac"))
  }

  /** Token counts (whitespace + BPE-ish regex) per document. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("n_bpe_tokens", bpeTokenCount(col(textCol)).cast("long"))

  /** Rolling-hash fingerprint per document. */
  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", rollingHash(col(textCol)))

  /** Canonical text normalization — the standard pre-dedup cleaning
    * step: lowercase, strip control characters, collapse whitespace
    * runs to single spaces, trim. Pure codegen'd per-row transform;
    * normalizing BEFORE hashing/shingling makes near-dup detection
    * robust to case/whitespace-only variants.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x08\\x0e-\\x1f\\x7f]", ""),
      wsPattern, " "))

  /** Normalized text per document + a change flag. */
  /** Sliding-window token chunking with overlap — the RAG/embedding
    * splitter: chunk i starts at token i·stride (0-based) and covers up
    * to `size` tokens; every start strictly inside the document emits,
    * so the final chunk may run short. Empty docs emit no chunks. Pure
    * per-row expression work (tokenize → sequence of starts → explode →
    * slice): no shuffle, scan-parallel at any scale.
    */
  def chunkTokens(df: DataFrame, textCol: String,
                  size: Int, stride: Int): DataFrame =
    chunkTokenArrays(df, textCol, size, stride)
      .withColumn("chunk_text", concat_ws(" ", col("chunk_toks")))
      .drop("chunk_toks")

  /** [[chunkTokens]] with the token ARRAY retained instead of re-joined
    * to a string — the form downstream token consumers (chunk-level
    * postings, embedders) want: re-splitting `chunk_text` would redo
    * the tokenizer's work on every chunk.
    */
  def chunkTokenArrays(df: DataFrame, textCol: String,
                       size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = tokens(col(textCol))
    df.withColumn("_toks", toks)
      .filter(org.apache.spark.sql.functions.size(col("_toks")) > 0)
      .withColumn("_start",
        explode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("_toks")) - 1, lit(stride))))
      .withColumn("chunk_id", (col("_start") / stride).cast("long"))
      .withColumn("chunk_toks", slice(col("_toks"), col("_start") + 1, lit(size)))
      .withColumn("n_chunk_tokens",
        org.apache.spark.sql.functions.size(col("chunk_toks")).cast("long"))
      .drop("_toks", "_start")
  }

  def normalized(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("text_norm", normalizeText(col(textCol)))
      .withColumn("changed", (col("text_norm") =!= col(textCol)).cast("boolean"))
}
