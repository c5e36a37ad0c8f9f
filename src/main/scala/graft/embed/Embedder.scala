package graft.embed

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text → fixed-dim embedding.
  *
  * The reference embeds with SBERT (`model.encode`,
  * create_collections.py:385-449; model ko-sbert-sts, 768-dim). A torch
  * model is out of environment and out of scope (SURVEY.md §7.3) — the
  * engine's embedder contract is "deterministic text → float[dim]", and
  * the Spark-native implementation is the classic
  * Tokenizer → HashingTF → IDF → L2-Normalizer chain: fully distributed,
  * codegen-adjacent, and deterministic (a feature for oracle tests).
  * The reference's per-batch encode-failure fallback (cc:422-434) maps to
  * null-out + filter; Spark task retries subsume per-batch retry.
  */
trait Embedder {
  def dim: Int
  /** Adds `outCol: array<float>` to df. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame
}

/** Fitted TF-IDF embedding model (IDF requires a corpus-level fit — the
  * analog of the reference loading a pretrained model once, cc:70-71).
  */
final class TfIdfEmbedderModel(val dim: Int, model: PipelineModel, textCol: String) extends Embedder {
  def embed(df: DataFrame, textColIn: String, outCol: String): DataFrame = {
    val renamed = textColIn != textCol
    val in = if (renamed) df.withColumn(textCol, col(textColIn)) else df
    val out = model.transform(in)
      .withColumn(outCol, vector_to_array(col("__norm"), "float32"))
      .drop("__tokens", "__tf", "__tfidf", "__norm")
    if (renamed) out.drop(textCol) else out
  }

  /** Persist the fitted pipeline (the reference loads its model from
    * disk once per session, cc:70-71 — M1).
    */
  def save(path: String): Unit = model.write.overwrite().save(path)
}

object TfIdfEmbedderModel {
  def load(path: String, dim: Int = 64, textCol: String = "text"): TfIdfEmbedderModel =
    new TfIdfEmbedderModel(dim, PipelineModel.load(path), textCol)
}

object TfIdfEmbedder {
  /** Fit the IDF stage on a corpus; everything else is stateless. */
  def fit(corpus: DataFrame, textCol: String = "text", dim: Int = 64): TfIdfEmbedderModel = {
    val stages: Array[org.apache.spark.ml.PipelineStage] = Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
        .setPattern("\\s+").setToLowercase(true),
      new HashingTF().setInputCol("__tokens").setOutputCol("__tf").setNumFeatures(dim),
      new IDF().setInputCol("__tf").setOutputCol("__tfidf"),
      new Normalizer().setInputCol("__tfidf").setOutputCol("__norm").setP(2.0))
    val model = new Pipeline().setStages(stages).fit(corpus)
    new TfIdfEmbedderModel(dim, model, textCol)
  }
}
