package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.bench.ChartSink
import graft.embed.TfIdfEmbedder
import graft.eval.RecallAtK
import graft.index.CollectionCatalog
import graft.model.Tables
import graft.search.{Hnsw, KnnExact}

/** End-to-end replica of the reference's two experiments, producing the
  * same eight artifact files its `experiment_results/` publishes
  * (results.json / results_summary.csv — chromadb_speed_experiment.py:
  * 599-637; recall_results.json / recall_summary.csv —
  * chromadb_acc_experiment.py:764-808; the four summary PNGs —
  * sp:550-591, ac:699-756), with the same column semantics under
  * English names (the reference's headers are Korean: collection name,
  * page count, query, mean total/search/embedding ms; recall@5/@10
  * mean+std, brute-force ms, ANN ms).
  *
  * Pipeline per the reference's shape: 5 text queries are EMBEDDED at
  * query time (their SBERT encode ≙ our fitted TF-IDF embedder — the
  * documented M1/M2 stand-in, Embedder.scala), then searched against
  * cumulative prefix collections of the embeddings fixture. The speed
  * experiment times exact search per (collection, query, run) with a
  * warm-up excluded (sp:457-499); the accuracy experiment scores REAL
  * HNSW (`search/Hnsw` — the SAME index family the reference queries;
  * its per-collection stored index ≙ the reference's per-collection
  * ChromaDB HNSW) against the exact oracle and times both engines
  * (ac:616-653). IVFADC+R remains the quantized production
  * alternative, covered by its own oracle rows and CURVES sections.
  * Recall stds are over runs of a deterministic searcher — 0.0, as in
  * the reference's published rows.
  *
  * Usage: runMain graft.tools.RunExperiment [sfDir] [outDir]
  * (defaults /root/testdata/sf0.1, experiment_results). One-off
  * artifact job — Bench's timed suite never runs this.
  */
object RunExperiment {

  private val queryTexts = Seq(
    "improving deep learning model performance",
    "natural language processing techniques",
    "computer vision algorithms",
    "reinforcement learning methods",
    "neural network architectures")

  private def timeMs(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e6
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "experiment_results"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .appName("graft-experiment")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, outDir) finally spark.stop()
  }

  def run(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val docs = Tables.documents(spark, sfDir)
    val embedder = TfIdfEmbedder.fit(docs, "text", dim = 64)
    val emb = Tables.embeddings(spark, sfDir).cache()
    val total = emb.count()
    val base = CollectionCatalog.seqFromId(emb, "vec_id")
    val nColls = 4
    val step = math.max(total / nColls, 1L)

    // Query embedding, timed per run the way the reference re-encodes
    // per search (sp:467-476). One (qid, qemb) frame reused everywhere.
    import spark.implicits._
    val qTextDf = queryTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("qid", "text").cache()
    def embedQueries(): DataFrame = embedder.embed(qTextDf, "text", "qemb")
      .select(col("qid"), col("qemb"))
    val queries = embedQueries().cache()
    noop(queries) // materialize outside any timing

    val collections = (1 to nColls).map { c =>
      val endIdx = math.min(c * step, total)
      (f"collection_${c}%04d_${endIdx}%dpages", endIdx,
        CollectionCatalog.prefixView(base, endIdx).cache())
    }
    collections.foreach { case (_, _, v) => noop(v) }

    val numRuns = 3
    // Global warm-up sweep: one untimed search per collection so JIT/
    // codegen warm-up lands nowhere in the curve (without it the FIRST
    // collections absorb all compilation cost and the size curve
    // inverts — the per-query warm-up below only covers plan caches).
    collections.foreach { case (_, _, view) =>
      noop(KnnExact.topK(queries, view, 5))
    }
    // ------------------------------------------------ speed experiment
    val speedRows = for {
      (name, nDocs, view) <- collections
      (qText, qid) <- queryTexts.zipWithIndex
    } yield {
      val q1 = queries.filter(col("qid") === qid)
      noop(KnnExact.topK(q1, view, 5)) // warm-up, excluded (sp:457-462)
      val runs = (1 to numRuns).map { _ =>
        val embedMs = timeMs(noop(embedQueries().filter(col("qid") === qid)))
        val searchMs = timeMs(noop(KnnExact.topK(q1, view, 5)))
        (embedMs, searchMs)
      }
      val avgEmbed = runs.map(_._1).sum / numRuns
      val avgSearch = runs.map(_._2).sum / numRuns
      SpeedRow(name, nDocs, qText, avgEmbed + avgSearch, avgSearch, avgEmbed)
    }

    // ----------------------------------------------- recall experiment
    // The reference's accuracy queries are SBERT embeddings probing an
    // SBERT corpus — in-distribution, which is what gives IVF its cell
    // concentration (ac:607-633). The TF-IDF text queries are OOD for
    // the isotropic embeddings fixture (near-tie distances spread the
    // true top-k uniformly over cells, capping ANY nprobe<numCells
    // searcher near nprobe/numCells), so the recall experiment uses the
    // suite-wide in-distribution convention instead: the first 5 corpus
    // vectors as queries.
    val recallQueries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb")).cache()
    noop(recallQueries)
    val recallRows = (for ((name, nDocs, view) <- collections) yield {
      // Index construction is the reference's collection-insert cost
      // (sp:260-290), excluded from its per-query HNSW times — build
      // the stored per-collection graph ONCE (≙ the reference's
      // per-collection ChromaDB HNSW), then time searches only.
      val idx = Hnsw.buildIndex(spark, view).cache()
      noop(idx)
      val rows = for ((qText, qid) <- queryTexts.zipWithIndex) yield {
        val q1 = recallQueries.filter(col("qid") === qid)
        def brute = KnnExact.topK(q1, view, 10)
        def approx = Hnsw.searchIndex(spark, q1, idx, 10)
        noop(brute); noop(approx) // warm-up
        val bruteMs = (1 to numRuns).map(_ => timeMs(noop(brute))).sum / numRuns
        val annMs = (1 to numRuns).map(_ => timeMs(noop(approx))).sum / numRuns
        val rec = RecallAtK.evaluate(brute, approx, Seq(5, 10)).collect().head
        RecallRow(name, nDocs, s"corpus_vector_$qid",
          rec.getAs[Double]("recall_5"), 0.0, rec.getAs[Double]("recall_10"), 0.0,
          bruteMs, annMs)
      }
      idx.unpersist(blocking = false)
      rows
    }).flatten

    writeSpeedArtifacts(spark, speedRows, outDir)
    writeRecallArtifacts(spark, recallRows, outDir)
    println(s"wrote ${new java.io.File(outDir).listFiles().length} artifacts to $outDir")
  }

  final case class SpeedRow(
      collection: String, num_pages: Long, query: String,
      avg_total_time_ms: Double, avg_search_time_ms: Double, avg_embedding_time_ms: Double)

  final case class RecallRow(
      collection: String, num_pages: Long, query: String,
      avg_recall_at_5: Double, std_recall_at_5: Double,
      avg_recall_at_10: Double, std_recall_at_10: Double,
      avg_brute_force_time_ms: Double, avg_hnsw_time_ms: Double)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** results.json nested per collection + flat results_summary.csv,
    * mirroring save_results (sp:599-637).
    */
  private def writeSpeedArtifacts(spark: SparkSession, rows: Seq[SpeedRow], outDir: String): Unit = {
    val byColl = rows.groupBy(r => (r.collection, r.num_pages)).toSeq.sortBy(_._1._2)
    val json = byColl.map { case ((name, n), qs) =>
      val qJson = qs.map(q =>
        s"""      {
           |        "query": ${jsonStr(q.query)},
           |        "avg_total_time_ms": ${q.avg_total_time_ms},
           |        "avg_search_time_ms": ${q.avg_search_time_ms},
           |        "avg_embedding_time_ms": ${q.avg_embedding_time_ms}
           |      }""".stripMargin).mkString(",\n")
      s"""  ${jsonStr(name)}: {
         |    "num_documents": $n,
         |    "queries": [
         |$qJson
         |    ]
         |  }""".stripMargin
    }.mkString("{\n", ",\n", "\n}\n")
    Files.write(Paths.get(outDir, "results.json"), json.getBytes(StandardCharsets.UTF_8))

    val csv = ("collection,num_pages,query,avg_total_time_ms,avg_search_time_ms,avg_embedding_time_ms" +:
      rows.map(r => s"${r.collection},${r.num_pages},${r.query},${r.avg_total_time_ms},${r.avg_search_time_ms},${r.avg_embedding_time_ms}"))
      .mkString("", "\n", "\n")
    Files.write(Paths.get(outDir, "results_summary.csv"), csv.getBytes(StandardCharsets.UTF_8))

    import spark.implicits._
    val perColl = rows.toDF()
      .groupBy(col("collection"), col("num_pages").as("num_documents"))
      .agg(avg(col("avg_search_time_ms")).as("grand_mean"))
      .orderBy(col("num_documents"))
    ChartSink.lineChart(perColl, "num_documents", Seq("grand_mean"),
      "Search speed by collection size", "pages", "mean search time (ms)",
      s"$outDir/search_speed_by_pages.png")
    ChartSink.barChart(perColl, "collection", Seq("grand_mean"),
      "Search speed by collection", "collection", "mean search time (ms)",
      s"$outDir/search_speed_by_collection.png")
  }

  /** recall_results.json + recall_summary.csv, mirroring ac:764-808. */
  private def writeRecallArtifacts(spark: SparkSession, rows: Seq[RecallRow], outDir: String): Unit = {
    val byColl = rows.groupBy(r => (r.collection, r.num_pages)).toSeq.sortBy(_._1._2)
    val json = byColl.map { case ((name, n), qs) =>
      val qJson = qs.map(q =>
        s"""      {
           |        "query": ${jsonStr(q.query)},
           |        "avg_recall_at_5": ${q.avg_recall_at_5},
           |        "std_recall_at_5": ${q.std_recall_at_5},
           |        "avg_recall_at_10": ${q.avg_recall_at_10},
           |        "std_recall_at_10": ${q.std_recall_at_10},
           |        "avg_brute_force_time_ms": ${q.avg_brute_force_time_ms},
           |        "avg_hnsw_time_ms": ${q.avg_hnsw_time_ms}
           |      }""".stripMargin).mkString(",\n")
      s"""  ${jsonStr(name)}: {
         |    "num_documents": $n,
         |    "queries": [
         |$qJson
         |    ]
         |  }""".stripMargin
    }.mkString("{\n", ",\n", "\n}\n")
    Files.write(Paths.get(outDir, "recall_results.json"), json.getBytes(StandardCharsets.UTF_8))

    val csv = ("collection,num_pages,query,avg_recall_at_5,std_recall_at_5,avg_recall_at_10,std_recall_at_10,avg_brute_force_time_ms,avg_hnsw_time_ms" +:
      rows.map(r => s"${r.collection},${r.num_pages},${r.query},${r.avg_recall_at_5},${r.std_recall_at_5},${r.avg_recall_at_10},${r.std_recall_at_10},${r.avg_brute_force_time_ms},${r.avg_hnsw_time_ms}"))
      .mkString("", "\n", "\n")
    Files.write(Paths.get(outDir, "recall_summary.csv"), csv.getBytes(StandardCharsets.UTF_8))

    import spark.implicits._
    val perColl = rows.toDF()
      .groupBy(col("collection"), col("num_pages").as("num_documents"))
      .agg(avg(col("avg_recall_at_5")).as("mean_recall_5"),
        avg(col("avg_recall_at_10")).as("mean_recall_10"))
      .orderBy(col("num_documents"))
    ChartSink.lineChart(perColl, "num_documents", Seq("mean_recall_5", "mean_recall_10"),
      "Recall@K by collection size (HNSW vs exact)", "pages", "recall",
      s"$outDir/recall_by_pages.png")
    ChartSink.barChart(perColl, "collection", Seq("mean_recall_5", "mean_recall_10"),
      "Recall@K by collection (HNSW vs exact)", "collection", "recall",
      s"$outDir/recall_by_collection.png")
  }
}
