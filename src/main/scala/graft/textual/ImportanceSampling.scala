package graft.textual

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style data selection via importance resampling (Xie et al.,
  * NeurIPS'23): score every document by how target-domain-like its
  * unigram distribution is — the per-token log-likelihood ratio between
  * an add-one-smoothed target LM and raw LM, both estimated from the
  * corpus itself. Selection then keeps the highest-weight raw documents
  * (or Gumbel-resamples on the weights); this operator produces the
  * weights, the selection being a plain ORDER BY/filter on top.
  *
  * Float discipline (the doc_unigram_logprob pattern): every count is
  * an exact BIGINT; the smoothed ratio ((c_t+1)(N_r+V)) / ((c_r+1)(N_t+V))
  * is a quotient of exact integer products (< 2^53), so `ln` sees a
  * bit-identical double in both engines; the final per-doc sum rounds
  * at 4 decimals.
  *
  * Scale posture: two linear hash shuffles (postings by term, weights
  * by doc) — identical shape to the unigram-LM scorer. Terms are
  * xxhash64-hashed before any shuffle (the dedup-family discipline;
  * DSIR itself hashes into 10k buckets — counts are hash-invariant, so
  * the string-term DuckDB oracle still matches). The totals frame is
  * one broadcast row; the per-term log-ratio table is vocab-sized and
  * joins the postings on the term shuffle key.
  */
object ImportanceSampling {

  /** Per-document importance weights. `isTarget` marks the documents
    * whose distribution defines the target LM (e.g. a trusted corpus
    * slice); all other documents form the raw LM. Output: (doc_id,
    * is_target, n_tokens, logratio_per_token) — positive ⇒ more
    * target-like than raw. Empty documents carry no tokens and drop.
    */
  def logRatioWeights(
      docs: DataFrame,
      isTarget: Column,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val post = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        size(toks).as("dl"), explode(toks).as("t"))
      .select(col("doc_id"), col("is_t"), col("dl"), xxhash64(col("t")).as("term"))
      .groupBy(col("doc_id"), col("is_t"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    weightsFromPost(post)
  }

  /** [[logRatioWeights]] over an EXISTING postings frame (doc_id, dl,
    * term, tf) — e.g. the search family's shared materialized index —
    * plus a (doc_id, is_t) flag frame, skipping re-tokenization. The
    * flag join is a plain doc_id equi-join with NO broadcast hint: the
    * flag frame is one row per document (linear in the corpus), so AQE
    * may broadcast it at fixture scale but must be free to shuffle at
    * 100 TB.
    */
  def logRatioWeightsFrom(post: DataFrame, flags: DataFrame): DataFrame =
    weightsFromPost(post.join(flags, Seq("doc_id")))

  private def weightsFromPost(post: DataFrame): DataFrame = {
    val byTerm = post.groupBy(col("term")).agg(
      sum(when(col("is_t"), col("tf")).otherwise(lit(0L))).as("ct"),
      sum(when(!col("is_t"), col("tf")).otherwise(lit(0L))).as("cr"))
    val totals = byTerm.agg(
      sum(col("ct")).as("nt"), sum(col("cr")).as("nr"), count(lit(1)).as("v"))
    val lr = byTerm.crossJoin(broadcast(totals))
      .select(col("term"),
        log(((col("ct") + 1) * (col("nr") + col("v"))).cast("double") /
          ((col("cr") + 1) * (col("nt") + col("v"))).cast("double")).as("lr"))
    post.join(lr, Seq("term"))
      .groupBy(col("doc_id"), col("is_t"), col("dl"))
      .agg(sum(col("tf") * col("lr")).as("ll"))
      .select(col("doc_id"), col("is_t").as("is_target"),
        col("dl").cast("long").as("n_tokens"),
        (col("ll") / col("dl")).as("logratio_per_token"))
  }

  /** The resampling half of DSIR: sample `n` documents without
    * replacement with probability ∝ exp(weight / temperature) via the
    * Gumbel top-k trick — key = w/T + Gumbel(0,1), take the n largest
    * keys. The Gumbel draw is DETERMINISTIC: the suite's multiplicative
    * hash coin maps doc_id to an exact dyadic uniform in (0,1), so
    * g = -ln(-ln(u)) is replayable bit-for-bit by the oracle. Top-k
    * executes as TakeOrderedAndProject — per-partition heaps, no global
    * sort materialization — so selection over 100 TB of weights is one
    * linear pass.
    */
  def gumbelTopK(
      weights: DataFrame,
      n: Int,
      temperature: Double = 1.0,
      idCol: String = "doc_id",
      weightCol: String = "logratio_per_token"): DataFrame = {
    val u = (((col(idCol) * lit(2654435761L)) % 65536) + 1).cast("double") / lit(65537.0)
    val g = -log(-log(u))
    // The weight is a float SUM whose accumulation order neither engine
    // guarantees (~1e-12 jitter); the Gumbel term is exact. Snap the
    // weight to the 1e-4 grid (the suite's lp4 half-up discipline)
    // BEFORE adding the noise so the selection sort key is bit-identical
    // on both engines — boundary membership of the top-k cannot flip on
    // accumulation order.
    val wr = floor(col(weightCol) / temperature * 1e4 + 0.5) / 1e4
    weights
      .withColumn("gkey", wr + g)
      .orderBy(col("gkey").desc, col(idCol))
      .limit(n)
  }
}
