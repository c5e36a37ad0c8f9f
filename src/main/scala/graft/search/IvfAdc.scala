package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Reusable batched IVFADC+R search (Jégou et al., TPAMI'11) — the
  * composition SparkEntry's `ann_ivfpq_top10`/`ann_ivfpq_multi` rows
  * hash-match inline, packaged for callers that sweep collections
  * (bench/RecallExperiment's IVFADC path, tools/RunExperiment).
  *
  * Stages, each scale-shaped (reference context: the reference's HNSW
  * per-collection index, chromadb_acc_experiment.py:616-633):
  *   1. coarse probe — queries × centroids (both tiny, broadcast),
  *      per-query top-`nprobe` cells via a group-limited window;
  *   2. cell pruning — the (qid, cell) probe frame broadcast onto the
  *      cell assignment; at 100 TB this is partition pruning on the
  *      cell-partitioned codes table, never a corpus shuffle;
  *   3. ADC — survivors ranked from m one-byte codes against the
  *      query's per-(block, code) distance table (broadcast);
  *   4. exact re-rank of the top-`rerank` candidates against the float
  *      vectors (the +R step that restores recall).
  *
  * Returns (qid, vec_id, rk, dist) with rk ≤ k, dist = round(l2, 4),
  * ties on (round(dist, 6), vec_id) — the suite-wide rank contract.
  */
object IvfAdc {

  /** The built index: cell assignments + PQ codes of one collection,
    * plus the frames/constants every search against it shares. Building
    * this is the INDEXING cost (the reference pays it at collection
    * insert time, chromadb_speed_experiment.py:260-290) — callers cache
    * both frames so per-query latency measures search, not re-indexing.
    */
  final case class Index(
      emb: DataFrame, // (vec_id, embedding)
      assigned: DataFrame, // (vec_id, cell)
      codes: DataFrame, // (vec_id, block, code)
      centroids: DataFrame,
      codebookDf: DataFrame,
      m: Int,
      w: Int)

  def buildIndex(
      collection: DataFrame, // (vec_id, embedding)
      centroids: DataFrame, // (cid, cemb)
      codebookDf: DataFrame, // (block, code, csub) — trained PQ codebook
      m: Int,
      w: Int): Index = {
    VectorExpressions.ensureRegistered(collection.sparkSession)
    val emb = collection.select(col("vec_id"), col("embedding"))
    val assigned = IvfIndex.assign(emb, centroids).select(col("vec_id"), col("cell"))
    val codes = Pq.assignments(Pq.subFrame(Pq.quantize(emb), m, w), codebookDf)
      .select(col("vec_id"), col("block"), col("code"))
    Index(emb, assigned, codes, centroids, codebookDf, m, w)
  }

  /** Search a prebuilt [[Index]]. */
  def searchIndex(
      queries: DataFrame, // (qid, qemb)
      index: Index,
      nprobe: Int,
      rerank: Int,
      k: Int): DataFrame = {
    import index.{assigned, centroids, codebookDf, emb, m, w}
    VectorExpressions.ensureRegistered(queries.sparkSession)

    val wProbe = Window.partitionBy(col("qid")).orderBy(col("cdist"), col("cid"))
    val probed = centroids.crossJoin(broadcast(queries))
      .select(col("qid"), col("cid"),
        sqrt(VectorExpressions.l2Sq(col("cemb"), col("qemb"))).as("cdist"))
      .withColumn("prk", row_number().over(wProbe)).filter(col("prk") <= nprobe)
      .select(col("qid"), col("cid").cast("long").as("cell"))
    val survivors = assigned.join(broadcast(probed),
      assigned("cell").cast("long") === probed("cell"))
      .select(col("qid"), assigned("vec_id"))

    val codes = index.codes
      .join(survivors, Seq("vec_id")) // one shared codes scan; qid fans out here
    val qSub = queries.select(col("qid"),
      posexplode(array((0 until m).map(b =>
        slice(transform(col("qemb"),
          x => floor(x.cast("double") * lit(Pq.QScale)).cast("double")),
          b * w + 1, w)): _*)).as(Seq("block", "sub")))
    val qd = qSub.join(broadcast(codebookDf), Seq("block"))
      .select(col("qid"), col("block"), col("code"),
        VectorExpressions.l2SqD(col("sub"), col("csub")).as("qd2"))

    val adc = codes.join(broadcast(qd), Seq("qid", "block", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qd2")).as("d2"))
    val wCand = Window.partitionBy(col("qid")).orderBy(col("d2"), col("vec_id"))
    val cand = adc.withColumn("crk", row_number().over(wCand)).filter(col("crk") <= rerank)
      .select(col("qid"), col("vec_id"))

    val wRank = Window.partitionBy(col("qid")).orderBy(round(col("dist"), 6), col("vec_id"))
    cand.join(emb, Seq("vec_id")).join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        sqrt(VectorExpressions.l2Sq(col("embedding"), col("qemb"))).as("dist"))
      .withColumn("rk", row_number().over(wRank)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("rk").cast("long").as("rk"),
        round(col("dist"), 4).as("dist"))
  }

  /** One-shot convenience: build the index and search it. */
  def search(
      queries: DataFrame,
      collection: DataFrame,
      centroids: DataFrame,
      codebookDf: DataFrame,
      m: Int,
      w: Int,
      nprobe: Int,
      rerank: Int,
      k: Int): DataFrame =
    searchIndex(queries, buildIndex(collection, centroids, codebookDf, m, w),
      nprobe, rerank, k)
}
