package graft.embed

import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LEARNED dense embeddings: seeded MLlib Word2Vec behind the same
  * [[Embedder]] contract as the hashed TF-IDF chain.
  *
  * The reference's whole point is semantic search quality — its SBERT
  * vectors (create_collections.py:418,480) place related texts NEAR
  * each other, which hashed TF-IDF structurally cannot (hash geometry
  * only reflects shared tokens). Word2Vec is the strongest in-env
  * learned embedder: skip-gram vectors trained on the corpus itself,
  * fully distributed, and — decisive for the oracle — deterministic for
  * a fixed (seed, data order, partition count).
  *
  * Determinism discipline: the token stream is coalesced to ONE sorted
  * partition before fit, so SGD sees an identical sentence order every
  * run; [[graft.W2vOracle]] freezes the trained vectors as literals
  * (the MllibLshOracle pattern — `graft.tools.FreezeW2v` regenerates,
  * and verifies two fits are bit-identical before printing). If a Spark
  * upgrade ever changes the seeded training stream, the correctness
  * gate fails loudly instead of drifting silently.
  *
  * Document embeddings are the MEAN of in-vocabulary word vectors
  * (computed here as an explode→broadcast-join→16-column avg, not
  * MLlib's transform UDF, so the arithmetic is plain Catalyst and
  * DuckDB-replayable; empty/no-vocab docs get the zero vector). All
  * arithmetic stays in DOUBLE end-to-end — the only float32 step is
  * MLlib's internal training, whose exact double outputs the oracle
  * literals carry.
  */
final class W2vEmbedderModel(
    val vectors: DataFrame, // (word: string, vec: array<double>)
    val dim: Int,
    idCol: String) extends Embedder {

  /** Mean in-vocab word vector per row of `df`; rows with no
    * in-vocabulary token keep a zero vector. `df` must have a unique
    * `idCol` (the explode→re-join needs a join-back key; synthesizing
    * one with monotonically_increasing_id would not survive task
    * retries deterministically).
    */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val toks = df.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
    val joined = toks.join(broadcast(vectors), toks("__w") === vectors("word"))
    val avgDims = (0 until dim).map(i => avg(col("vec")(i)).as(s"__d$i"))
    val emb = joined.groupBy(col(idCol))
      .agg(avgDims.head, avgDims.tail: _*)
      .select(col(idCol), array((0 until dim).map(i => col(s"__d$i")): _*).as(outCol))
    df.join(emb, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol),
        array((0 until dim).map(_ => lit(0.0)): _*)))
  }
}

object W2vEmbedder {
  /** The deterministic, BOUNDED training frame `fit` consumes: at most
    * ~`maxTrainRows` docs regardless of corpus size. The serial
    * one-partition shuffle below is the determinism contract's price,
    * so its input must be capped IN CODE, not by caller discipline —
    * a 100 TB corpus trains on a hash-selected sample, never on a
    * single-task shuffle of everything. Selection is
    * [[graft.operators.ApproxOps.hashSample]] (md5-bucketed — the same
    * rows every run and every engine) over-sampled one bucket high,
    * then a hard `limit` on the sorted single partition (deterministic:
    * the sample's smallest ids win), so the cap is exact, not
    * fraction-approximate.
    */
  private[graft] def trainingTokens(
      corpus: DataFrame,
      textCol: String,
      idCol: String,
      maxTrainRows: Long): DataFrame = {
    // The count is the cap decision itself (cheap next to the fit); at
    // fixture scale n <= maxTrainRows and the corpus passes untouched.
    val n = corpus.count()
    val capped =
      if (n <= maxTrainRows) corpus
      else graft.operators.ApproxOps.hashSample(
        corpus, idCol,
        // hashSample quantizes to round(fraction·256) buckets, so the
        // headroom is computed in BUCKET units: ceil of the exact
        // requirement plus two spare buckets (round() can otherwise
        // shave the headroom to ~half a bucket, and bucket occupancy
        // varies). The limit below trims any overshoot exactly; the cap
        // is an UPPER bound — occupancy variance can still land the
        // sample slightly below it on small corpora.
        math.min(1.0,
          (math.ceil(maxTrainRows.toDouble / n * 256) + 2.0) / 256.0))
    val toks = capped
      .select(col(idCol), split(lower(col(textCol)), "\\s+").as("__tokens"))
      .withColumn("__tokens", filter(col("__tokens"), w => length(w) > 0))
      .coalesce(1)
      .sortWithinPartitions(idCol)
    if (n <= maxTrainRows) toks
    else toks.limit(math.min(maxTrainRows, Int.MaxValue.toLong).toInt)
  }

  /** Fit a seeded skip-gram model on the corpus. One sorted partition +
    * fixed seed + maxIter 1 ⇒ reproducible vectors (FreezeW2v verifies
    * bit-identity across fits before freezing). `maxTrainRows` bounds
    * the serial determinism stage — see [[trainingTokens]].
    */
  def fit(
      corpus: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      dim: Int = 16,
      seed: Long = 42L,
      minCount: Int = 1,
      maxIter: Int = 1,
      maxTrainRows: Long = 1000000L): W2vEmbedderModel = {
    val toks = trainingTokens(corpus, textCol, idCol, maxTrainRows)
    val model = new Word2Vec()
      .setInputCol("__tokens").setOutputCol("__w2v")
      .setVectorSize(dim).setSeed(seed).setMinCount(minCount)
      .setMaxIter(maxIter).setNumPartitions(1)
      .fit(toks)
    val vectors = model.getVectors // (word, vector: ml DenseVector of double)
      .select(col("word"),
        org.apache.spark.ml.functions.vector_to_array(col("vector")).as("vec"))
    new W2vEmbedderModel(vectors, dim, idCol)
  }
}
