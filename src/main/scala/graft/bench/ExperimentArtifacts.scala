package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.CollectionCatalog
import graft.model.Tables

/** End-to-end experiment sidecar: runs a bounded speed + recall
  * experiment and persists every sink the reference's save path writes —
  * JSON results, headered CSV summaries (S9/S10,
  * chromadb_speed_experiment.py:599-637 / chromadb_acc_experiment.py:
  * 764-808), parquet twins for downstream jobs, and the four summary
  * PNGs (S11, sp:550-591 / ac:699-756) — under one output directory.
  *
  * Bench calls this after the timed suite (so artifacts never pollute
  * the wall-clock number); ExperimentSpec drives it at fixture scale and
  * asserts the schemas, row counts and PNG signatures. The experiment is
  * bounded by `maxVectors` regardless of input SF: its purpose is the
  * artifact CONTRACT, not another benchmark — BENCH_DETAIL.json is the
  * benchmark.
  */
object ExperimentArtifacts {

  /** Runs both experiments on a bounded prefix of the embeddings fixture
    * and writes all artifacts under `outDir`. Returns (perQuery,
    * perCollection, recallStats) for callers that want to assert on the
    * frames themselves.
    */
  def writeAll(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      maxVectors: Long = 1000,
      nQueries: Int = 2,
      numRuns: Int = 2): (DataFrame, DataFrame, DataFrame) = {
    val emb = Tables.embeddings(spark, sfDir)
    val base = CollectionCatalog.seqFromId(emb.filter(col("vec_id") < maxVectors), "vec_id")
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val step = math.max(maxVectors / 4, 1)

    val timings = SpeedExperiment.run(spark, base, queries, step, topK = 5, numRuns = numRuns)
    val perQuery = SpeedExperiment.perQueryStats(timings)
    val perColl = SpeedExperiment.perCollectionStats(timings)
    SpeedExperiment.save(perQuery, perColl, outDir)
    perQuery.coalesce(1).write.mode("overwrite").parquet(s"$outDir/speed_per_query_parquet")
    perColl.coalesce(1).write.mode("overwrite").parquet(s"$outDir/speed_per_collection_parquet")

    val recalls = RecallExperiment.run(spark, base, queries, step)
    val recallStats = RecallExperiment.perCollectionStats(recalls)
    RecallExperiment.save(recalls, recallStats, outDir)
    recallStats.coalesce(1).write.mode("overwrite").parquet(s"$outDir/recall_stats_parquet")

    // The reference's four PNGs, same content: search time vs collection
    // size as a line (sp:554-560), per-collection bar with value labels
    // (sp:574-588), recall@5/@10 vs size (ac:700-725), recall bars
    // (ac:727-756). grand_mean comes from LatencyStats.grandMean (A7).
    ChartSink.lineChart(perColl, "num_documents", Seq("grand_mean"),
      "Search speed by collection size", "pages", "mean search time (ms)",
      s"$outDir/search_speed_by_pages.png")
    ChartSink.barChart(perColl, "collection", Seq("grand_mean"),
      "Search speed by collection", "collection", "mean search time (ms)",
      s"$outDir/search_speed_by_collection.png")
    ChartSink.lineChart(recallStats, "num_documents", Seq("mean_recall_5", "mean_recall_10"),
      "Recall@K by collection size", "pages", "recall",
      s"$outDir/recall_by_pages.png")
    ChartSink.barChart(recallStats, "collection", Seq("mean_recall_5", "mean_recall_10"),
      "Recall@K by collection (exact vs LSH)", "collection", "recall",
      s"$outDir/recall_by_collection.png")

    (perQuery, perColl, recallStats)
  }
}
