package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Keyword and hybrid retrieval over a document corpus.
  *
  * The reference is a pure vector store (ChromaDB collections queried by
  * embedding only — chromadb_speed_experiment.py:260-266). A production
  * replacement needs the other half of the retrieval stack: keyword
  * search (BM25), the classic vector-space model (TF-IDF cosine), and
  * hybrid fusion of sparse + dense rankings (reciprocal rank fusion, the
  * standard in Elasticsearch/Vespa/Weaviate hybrid endpoints). All three
  * are expressed as inverted-index dataflow, so the DuckDB oracle can
  * verify scores exactly — unlike the murmur3 HashingTF embedder, every
  * weight here is a closed-form function of (tf, df, dl, N).
  *
  * Scale posture at 100 TB:
  *   - The postings list (doc_id, term, tf, dl) is ONE shuffle over the
  *     tokenized corpus; doc length dl rides along from the scan (no
  *     second per-doc join).
  *   - Vocabulary-level frames (df, idf) aggregate postings down to
  *     |vocab| rows and BROADCAST; the per-query term lists broadcast
  *     trivially.
  *   - Candidate generation is the broadcast inverted-index probe
  *     (postings ⋈ query terms on term): only docs sharing a term ever
  *     leave the scan, never an all-docs × all-queries product.
  *   - Per-query top-k goes through row_number ≤ k, which Spark rewrites
  *     to WindowGroupLimit (per-partition heap, O(k) per partition).
  *
  * Determinism: ranks order by (round(score, 6) DESC, doc_id ASC) so a
  * sub-1e-6 float divergence between engines cannot flip a rank.
  */
object TextSearch {

  val K1 = 1.2
  val B = 0.75
  /** Standard RRF dampening constant (Cormack et al., SIGIR'09). */
  val RrfK = 60

  /** Inverted index with doc length: (doc_id, term, tf, dl). dl is
    * computed inline from the token array so no extra join touches the
    * corpus. `term` is the token's xxhash64 — term IDENTITY never
    * reaches any scorer's output (only doc ids and closed-form weights
    * of tf/df/dl/N do, all hash-invariant), so every postings shuffle
    * and vocab join carries 8-byte longs instead of strings; query
    * terms go through the SAME hash, so equi-joins are unchanged
    * (collisions ~|vocab|²/2^64, the accepted sketch contract shared
    * with the hashed dedup shingles).
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), size(toks).as("dl"), explode(toks).as("t"))
      .select(col("doc_id"), col("dl"), xxhash64(col("t")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Distinct (query_id, term-hash) pairs from a (query_id, query_text)
    * frame — hashed with the same xxhash64 as [[postings]].
    */
  def queryTerms(queries: DataFrame): DataFrame =
    queries.select(col("query_id"), explode(TextFunctions.tokens(col("query_text"))).as("t"))
      .select(col("query_id"), xxhash64(col("t")).as("term"))
      .distinct()

  /** 1-row (n_docs, avgdl) corpus stats frame. */
  private def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(size(TextFunctions.tokens(col(textCol))).cast("double")).as("avgdl"))

  /** The materialized search index: (postings, corpus stats). A search
    * system builds its inverted index ONCE and serves every scorer from
    * it (the reference's ChromaDB collection is exactly such a
    * persistent index); callers that run several scorers over one
    * corpus should build this once — persisted — and use the `*From`
    * variants (SparkEntry does, via its shared-index cache).
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String): (DataFrame, DataFrame) =
    (postings(docs, idCol, textCol), corpusStats(docs, textCol))

  /** Per-term document frequency from the postings list (vocab-sized). */
  private def docFreq(post: DataFrame): DataFrame =
    post.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Per-query top-k by score. k must be positive: the `rk <= k` filter
    * on row_number is what lets Spark rewrite the window to
    * WindowGroupLimit (per-partition top-k heap, O(k) state per
    * partition) — an unfiltered ranking would fully sort every
    * candidate doc per query partition, the one plan shape that cannot
    * survive a common term's millions-row posting list at 100 TB.
    */
  private def rankTopK(scored: DataFrame, scoreCol: String, k: Int): DataFrame = {
    require(k > 0, s"rankTopK needs a positive cap, got $k")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col(scoreCol), 6).desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Okapi BM25 top-k per query.
    *
    * score(q,d) = Σ_{t ∈ q ∩ d} ln(1 + (N − df + 0.5)/(df + 0.5)) ·
    *              tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String, queries: DataFrame,
           k: Int = 10): DataFrame =
    bm25From(postings(docs, idCol, textCol), corpusStats(docs, textCol), queries, k)

  /** BM25's vocab-sized (term, idf, avgdl) frame — a pure function of
    * the postings, so an index owner materializes it once (see
    * SparkEntry's shared bundle) instead of re-aggregating the full
    * postings list per query.
    */
  def bm25Idf(post: DataFrame, stats: DataFrame): DataFrame =
    docFreq(post).crossJoin(stats)
      .select(col("term"),
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)).as("idf"),
        col("avgdl"))

  def bm25From(post: DataFrame, stats: DataFrame, queries: DataFrame, k: Int): DataFrame =
    bm25FromIdf(post, bm25Idf(post, stats), queries, k)

  def bm25FromIdf(post: DataFrame, idf: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // Restrict the vocab-sized idf to the query's terms BEFORE any
    // broadcast: `term` is unique in idf (docFreq groups by it), so the
    // equi-join is ≤ |query terms| rows — bounded by query length, not
    // by corpus vocabulary. Broadcasting the FULL idf would ship the
    // whole vocab to every executor at 100 TB.
    val qidf = idf.join(broadcast(queryTerms(queries)), Seq("term"))
    val matched = post.join(broadcast(qidf), Seq("term"))
    val scored = matched
      .withColumn("w", col("idf") * col("tf") * lit(K1 + 1.0) /
        (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("score"))
    rankTopK(scored, "score", k)
  }

  /** Vector-space-model cosine top-k per query: the sparse TF-IDF
    * vectors nobody materializes — the dot product runs over shared
    * terms only, norms aggregate once per doc.
    *
    * w_d(t) = tf · idf(t),  idf(t) = ln((N+1)/(df+1)) + 1  (smooth)
    * w_q(t) = idf(t) for each distinct query term
    * cos(q,d) = Σ w_q·w_d / (‖q‖·‖d‖)
    */
  def vsmCosine(docs: DataFrame, idCol: String, textCol: String, queries: DataFrame,
                k: Int = 10): DataFrame =
    vsmCosineFrom(postings(docs, idCol, textCol), corpusStats(docs, textCol), queries, k)

  /** VSM's doc-side frames — smooth idf (vocab-sized), tf·idf weighted
    * postings, per-doc norms. All pure functions of the postings; the
    * norms are the one aggregate that must touch EVERY term of every
    * doc, which is exactly why an index owner materializes them at
    * build time rather than per query.
    */
  def vsmDocSide(post: DataFrame, stats: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val idf = docFreq(post).crossJoin(stats.select(col("n_docs")))
      .select(col("term"),
        (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0).as("idf"))
    // Doc-side weights over the FULL postings list (norms need every
    // term), so this join genuinely touches the whole vocab — NO
    // broadcast hint: AQE broadcasts the idf at fixture scale and falls
    // back to the term-key shuffle join at 100-TB vocab sizes (this is
    // the one-time index build, where a shuffle is the right price).
    val weighted = post.join(idf, Seq("term"))
      .select(col("doc_id"), col("term"), (col("tf") * col("idf")).as("w"))
    val docNorm = weighted.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("dnorm"))
    (idf, weighted, docNorm)
  }

  def vsmCosineFrom(post: DataFrame, stats: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val (idf, weighted, docNorm) = vsmDocSide(post, stats)
    vsmCosineFromParts(idf, weighted, docNorm, queries, k)
  }

  def vsmCosineFromParts(idf: DataFrame, weighted: DataFrame, docNorm: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    // Query-side weights and norms: idf restricted to the query's terms
    // (≤ |query terms| rows — term is unique in idf), never the full
    // vocab frame (see bm25FromIdf).
    val qw = idf.join(broadcast(queryTerms(queries)), Seq("term"))
      .select(col("query_id"), col("term"), col("idf").as("qw"))
    val qNorm = qw.groupBy(col("query_id")).agg(sqrt(sum(col("qw") * col("qw"))).as("qnorm"))
    val dot = weighted.join(broadcast(qw), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w") * col("qw")).as("dot"))
    val scored = dot
      .join(docNorm, Seq("doc_id"))
      .join(broadcast(qNorm), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        (col("dot") / (col("dnorm") * col("qnorm"))).as("score"))
    rankTopK(scored, "score", k)
  }

  /** Reciprocal-rank fusion of the BM25 and VSM rankings:
    * rrf(q,d) = 1/(60 + rank_bm25) + 1/(60 + rank_vsm),
    * where each scorer contributes its top-k′ list (k′ = candMult·k)
    * and a doc absent from one list contributes 0 from it (rank
    * reported as the 0 sentinel) — standard capped RRF, fusing ranked
    * LISTS, not full rankings. Round 7 fused the FULL rankings (k=-1),
    * which forced an uncapped row_number over every candidate doc per
    * query — the suite's slowest plan, and a scale-killer once one
    * common query term matches millions of docs. With the cap, both
    * scorers go through WindowGroupLimit (TextSearchSpec pins capped ≡
    * full on the fused top-k; PlanSpec pins the plan shape).
    *
    * Why the result is still "never drops a candidate" in practice: a
    * doc outside BOTH top-k′ lists scores < 2/(RrfK + k′), below any
    * doc inside one list's top (k′−RrfK)… with candMult=100·k the
    * fused top-k is identical to full-ranking fusion unless both lists
    * are adversarially interleaved past rank 1000 — the spec asserts
    * equality empirically on the fixtures.
    */
  def hybridRrf(docs: DataFrame, idCol: String, textCol: String, queries: DataFrame,
                k: Int = 10, candMult: Int = 100): DataFrame = {
    val (post, stats) = buildIndex(docs, idCol, textCol)
    hybridRrfFrom(post, stats, queries, k, candMult)
  }

  def hybridRrfFrom(post: DataFrame, stats: DataFrame, queries: DataFrame,
                    k: Int, candMult: Int = 100): DataFrame = {
    val (idf, weighted, docNorm) = vsmDocSide(post, stats)
    hybridRrfFromParts(post, bm25Idf(post, stats), idf, weighted, docNorm,
      queries, k, candMult)
  }

  def hybridRrfFromParts(post: DataFrame, bIdf: DataFrame, vIdf: DataFrame,
      weighted: DataFrame, docNorm: DataFrame, queries: DataFrame,
      k: Int, candMult: Int = 100): DataFrame = {
    val kPrime = k * candMult
    val b = bm25FromIdf(post, bIdf, queries, k = kPrime)
      .select(col("query_id"), col("doc_id"), col("rk").as("rk_bm25"))
    val v = vsmCosineFromParts(vIdf, weighted, docNorm, queries, k = kPrime)
      .select(col("query_id"), col("doc_id"), col("rk").as("rk_vsm"))
    def contrib(rk: org.apache.spark.sql.Column) =
      when(rk > 0, lit(1.0) / (lit(RrfK.toDouble) + rk)).otherwise(lit(0.0))
    val fused = b.join(v, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("rk_bm25"), lit(0)).as("rk_bm25"),
        coalesce(col("rk_vsm"), lit(0)).as("rk_vsm"))
      .withColumn("rrf", contrib(col("rk_bm25")) + contrib(col("rk_vsm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("rrf"), 6).desc, col("doc_id").asc)
    fused.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Per-document mean token log-likelihood under the corpus MLE unigram
    * LM — the cheap perplexity proxy used as a training-data quality
    * signal (documents far below the corpus mode are gibberish / wrong
    * language / OCR noise; far above are boilerplate). ll(d) = Σ_t
    * tf(d,t)·ln(ctf(t)/N) / dl(d), always negative; more negative =
    * more surprising.
    *
    * Three linear shuffles, all vocabulary- or corpus-row-bounded:
    * postings (doc,term), the vocab-sized ctf aggregate, the postings⋈ctf
    * term join, and the per-doc re-aggregation. The 1-row corpus total
    * broadcasts. No step is quadratic; at 100 TB the term join is the
    * standard inverted-index equi-join on a Zipf key (salt the head terms
    * if a single term's postings overflow a partition — same discipline
    * as Salting.saltedSum).
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    unigramLogProbFrom(postings(docs, idCol, textCol))

  def unigramLogProbFrom(post: DataFrame): DataFrame = {
    val ctf = post.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val total = ctf.agg(sum(col("ctf")).as("n_total"))
    post.join(ctf, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"), col("dl"))
      .agg(sum(col("tf") * log(col("ctf").cast("double") / col("n_total").cast("double"))).as("ll"))
      .select(col("doc_id"), col("dl").cast("long").as("n_tokens"),
        (col("ll") / col("dl")).as("mean_logprob"))
  }
}
