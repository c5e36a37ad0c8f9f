package graft.search

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search — the analog of the reference's
  * HNSW path (`collection.query(query_embeddings=…, n_results=k)`,
  * chromadb_speed_experiment.py:473-477, chromadb_acc_experiment.py:622-629).
  *
  * Spark's built-in ANN primitive is LSH (BucketedRandomProjectionLSH for
  * L2) — algorithmically different from HNSW but the same *contract*:
  * approximate top-k with measured recall against the exact oracle
  * (SURVEY.md §2.3 J2). Never expect result-identity with exact search;
  * test it the reference's way, by Recall@K floor (§5).
  *
  * Scale posture: the index is a fitted model (random projections —
  * O(dim·tables) driver state, broadcastable); `approxSimilarityJoin`
  * shuffles on hash-bucket keys only, so the big side never cross-joins.
  */
final class LshIndex private (
    val model: BucketedRandomProjectionLSHModel,
    idCol: String,
    embCol: String) extends Serializable {

  /** Collection side with vector + hash columns (cache for reuse). */
  def transform(collection: DataFrame): DataFrame =
    model.transform(collection.withColumn("__vec", array_to_vector(col(embCol))))

  /** Batch ANN top-k: bucket-join queries to collection, rank within
    * query, keep k. `radius` bounds the bucket-join distance (must exceed
    * the true k-th-neighbor distance for full recall).
    */
  def topK(queries: DataFrame, collection: DataFrame, k: Int, radius: Double,
      qidCol: String = "qid", qEmbCol: String = "qemb"): DataFrame = {
    val q = queries.withColumn("__vec", array_to_vector(col(qEmbCol)))
    val joined = model.approxSimilarityJoin(
      q, collection.withColumn("__vec", array_to_vector(col(embCol))), radius, "dist")
    val w = Window.partitionBy(col(s"datasetA.$qidCol")).orderBy(col("dist").asc, col(s"datasetB.$idCol").asc)
    joined
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(
        col(s"datasetA.$qidCol").as(qidCol),
        col(s"datasetB.$idCol").as(idCol),
        col("rk"),
        round(col("dist"), 4).as("dist"))
  }

  /** Single-vector ANN (the reference's per-query probe shape). */
  def topKSingle(collection: DataFrame, queryVec: Seq[Float], k: Int): DataFrame = {
    val key = Vectors.dense(queryVec.map(_.toDouble).toArray)
    model.approxNearestNeighbors(
      transform(collection), key, k).select(col(idCol), col("distCol").as("dist"))
  }
}

object LshIndex {
  /** Wrap a persisted model (model.write.save / Model.load round-trip —
    * the reference persists its index per collection, S8/M4).
    */
  def fromModel(
      model: BucketedRandomProjectionLSHModel,
      idCol: String = "vec_id",
      embCol: String = "embedding"): LshIndex =
    new LshIndex(model, idCol, embCol)

  /** Fit an LSH index. bucketLength ≈ typical pairwise distance / 2 keeps
    * buckets selective; numHashTables trades recall for probe cost.
    */
  def fit(
      collection: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      numHashTables: Int = 8,
      bucketLength: Double = 1.0,
      seed: Long = 42L): LshIndex = {
    val withVec = collection.withColumn("__vec", array_to_vector(col(embCol)))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__vec")
      .setOutputCol("__hashes")
      .setNumHashTables(numHashTables)
      .setBucketLength(bucketLength)
      .setSeed(seed)
    new LshIndex(lsh.fit(withVec), idCol, embCol)
  }
}
