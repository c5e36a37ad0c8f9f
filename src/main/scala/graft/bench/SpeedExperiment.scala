package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.LatencyStats
import graft.index.CollectionCatalog
import graft.search.KnnExact

/** The reference's speed benchmark as a library job — E1
  * (chromadb_speed_experiment.main, sp:641-711): for each cumulative
  * collection (sorted by size, sp:438-440), for each query: one excluded
  * warm-up (sp:457-462), then `numRuns` timed top-k searches
  * (sp:467-499), aggregated to mean/median/sample-stddev per
  * (collection, query) and grand means per collection (A2-A4, A7).
  *
  * Differences by design: collections are zero-copy prefix views (not 29
  * materialized copies); timing uses System.nanoTime (time.time()'s ms
  * resolution produced 0.0 readings — BASELINE.md caveats); the search
  * itself runs distributed instead of pulling vectors to the client.
  */
object SpeedExperiment {

  final case class RunTiming(
      collection: String,
      num_documents: Long,
      query_id: Long,
      run: Int,
      search_ms: Double)

  /** Time `numRuns` executions per (collection prefix, query). */
  def run(
      spark: SparkSession,
      base: DataFrame, // (vec_id/seq/embedding ...)
      queries: DataFrame, // (qid, qemb)
      step: Long,
      topK: Int = 5,
      numRuns: Int = 3): DataFrame = {
    import spark.implicits._
    val total = base.count()
    val nColls = ((total + step - 1) / step).toInt
    val qids = queries.select("qid").as[Long].collect().sorted
    val timings = for {
      c <- 1 to nColls
      endIdx = math.min(c * step, total)
      view = CollectionCatalog.prefixView(base, endIdx)
      // Name by the actual end index so the label of a final partial
      // collection agrees with num_documents (and planCollections).
      name = f"collection_${c}%04d_${endIdx}%dpages"
      nDocs = view.count()
      qid <- qids
      q = queries.filter(col("qid") === qid)
      // warm-up, excluded from timing (sp:457-462)
      _ = KnnExact.topK(q, view, topK).write.format("noop").mode("overwrite").save()
      r <- 1 to numRuns
    } yield {
      val t0 = System.nanoTime()
      KnnExact.topK(q, view, topK).write.format("noop").mode("overwrite").save()
      RunTiming(name, nDocs, qid, r, (System.nanoTime() - t0) / 1e6)
    }
    spark.createDataFrame(timings)
  }

  /** A2-A4 per (collection, query): mean/median/sample-std of run times. */
  def perQueryStats(timings: DataFrame): DataFrame =
    LatencyStats.stats(timings, Seq("collection", "num_documents", "query_id"), "search_ms")

  /** A7: grand mean per collection across queries, sorted by size (O1). */
  def perCollectionStats(timings: DataFrame): DataFrame =
    LatencyStats.grandMean(timings, Seq("query_id"), Seq("collection", "num_documents"), "search_ms")
      .orderBy(col("num_documents"))

  /** S9/S10 sinks: JSON + headered CSV, like the reference's
    * save_results (sp:599-637).
    */
  def save(perQuery: DataFrame, perCollection: DataFrame, outDir: String): Unit = {
    perQuery.coalesce(1).write.mode("overwrite").json(s"$outDir/speed_results_json")
    perCollection.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/speed_summary_csv")
  }
}
