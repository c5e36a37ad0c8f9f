package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Exact k-nearest-neighbor search — the reference's brute-force oracle
  * (`brute_force_search`, chromadb_acc_experiment.py:508-537): L2 distance
  * from the query to every collection row, take top-k.
  *
  * Spark-first shape (SURVEY.md §2.3 J1): the tiny query side is
  * broadcast and cross-joined against the collection (Catalyst plans a
  * BroadcastNestedLoopJoin — no shuffle of the big side), distance is a
  * codegen'd column expression, and top-k per query is a ranking window.
  * Spark ≥3.5 pushes the `row_number <= k` filter into the window exchange
  * (WindowGroupLimit), so only ~k rows per input partition are shuffled —
  * this is what keeps the operator viable on a 1000-executor cluster:
  * shuffle volume is O(k · partitions), not O(N).
  *
  * For a single query vector, `ORDER BY dist LIMIT k` plans as
  * TakeOrderedAndProject (per-partition heap + driver merge, no shuffle).
  */
object KnnExact {

  /** Batch form: one row per (query, neighbor), `rk` 1..k per query.
    *
    * @param queries    small DataFrame of (qidCol, qEmbCol) — broadcast.
    * @param collection large DataFrame of (idCol, embCol).
    * @param scoreAsc   ascending scoring column builder, e.g. L2 distance
    *                   (ascending = nearer first).
    */
  def topKBy(
      queries: DataFrame,
      collection: DataFrame,
      k: Int,
      qidCol: String,
      idCol: String,
      scoreAsc: (Column, Column) => Column,
      qEmbCol: String = "qemb",
      embCol: String = "embedding",
      scoreName: String = "dist",
      pairFilter: Column = lit(true)): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(collection.sparkSession)
    val scored = broadcast(queries)
      .crossJoin(collection)
      .filter(pairFilter)
      .withColumn(scoreName, scoreAsc(col(qEmbCol), col(embCol)))
    // Deterministic tie-break on id: numpy argsort in the reference is
    // stable; Spark sort is not — (score, id) ordering keeps both engines
    // and the DuckDB oracle in agreement (SURVEY.md §7.4).
    val w = Window.partitionBy(col(qidCol)).orderBy(col(scoreName).asc, col(idCol).asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(qidCol), col(idCol), col("rk"), col(scoreName))
  }

  /** L2 top-k (the reference's metric). */
  def topK(
      queries: DataFrame,
      collection: DataFrame,
      k: Int,
      qidCol: String = "qid",
      idCol: String = "vec_id"): DataFrame =
    topKBy(queries, collection, k, qidCol, idCol, (q, c) => l2Fast(q, c))

  /** Cosine-similarity top-k (descending similarity ≡ ascending negated). */
  def topKCosine(
      queries: DataFrame,
      collection: DataFrame,
      k: Int,
      qidCol: String = "qid",
      idCol: String = "vec_id"): DataFrame =
    topKBy(queries, collection, k, qidCol, idCol, (q, c) => -cosineFast(q, c), scoreName = "negsim")
      .withColumn("sim", -col("negsim"))
      .drop("negsim")

  /** Max-inner-product top-k (dot product DESCENDING) — the retrieval
    * mode of two-tower / dual-encoder models, where score = q·x is not a
    * metric (no triangle inequality, not symmetric in scale), so metric
    * indexes cannot serve it directly; `ann_mips_top10` demonstrates the
    * Shrivastava & Li (NeurIPS 2014) augmented-L2 reduction that makes
    * any L2 index (IVF/HNSW/PQ) answer MIPS queries exactly.
    */
  def topKDot(
      queries: DataFrame,
      collection: DataFrame,
      k: Int,
      qidCol: String = "qid",
      idCol: String = "vec_id"): DataFrame =
    topKBy(queries, collection, k, qidCol, idCol,
      (q, c) => -graft.functions.VectorExpressions.dot(q, c), scoreName = "negip")
      .withColumn("ip", -col("negip"))
      .drop("negip")

  /** Cosine top-k restricted by a per-pair predicate over (query cols ×
    * collection cols) — e.g. hard-negative mining, where the candidate
    * must NOT share the query's class. The predicate runs between the
    * broadcast expansion and the ranking window, so excluded pairs never
    * reach the top-k heaps.
    */
  def topKCosineWhere(
      queries: DataFrame,
      collection: DataFrame,
      k: Int,
      pairFilter: Column,
      qidCol: String = "qid",
      idCol: String = "vec_id"): DataFrame =
    topKBy(queries, collection, k, qidCol, idCol, (q, c) => -cosineFast(q, c),
      scoreName = "negsim", pairFilter = pairFilter)
      .withColumn("sim", -col("negsim"))
      .drop("negsim")

  /** Radius (range) search: every (query, neighbor) pair within `radius`
    * L2 distance — threshold retrieval rather than top-k. No window and
    * no ordering shuffle at all: broadcast nested-loop + a codegen'd
    * distance filter, so it parallelizes perfectly over collection
    * partitions and output size is data-driven.
    */
  def rangeSearch(
      queries: DataFrame,
      collection: DataFrame,
      radius: Double,
      qidCol: String = "qid",
      idCol: String = "vec_id",
      qEmbCol: String = "qemb",
      embCol: String = "embedding"): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(collection.sparkSession)
    broadcast(queries)
      .crossJoin(collection)
      .withColumn("dist", l2Fast(col(qEmbCol), col(embCol)))
      .filter(col("dist") <= radius)
      .select(col(qidCol), col(idCol), col("dist"))
  }

  /** Single-query form: no window, no shuffle — TakeOrderedAndProject. */
  def topKSingle(
      collection: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(collection.sparkSession)
    val q = lit(queryVec.toArray)
    collection
      .withColumn("dist", l2Fast(q, col(embCol)))
      .select(col(idCol), col("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }
}
