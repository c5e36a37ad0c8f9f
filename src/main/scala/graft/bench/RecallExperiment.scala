package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.RecallAtK
import graft.index.CollectionCatalog
import graft.search.{KnnExact, LshIndex}

/** The reference's accuracy benchmark as a library job — E2
  * (chromadb_acc_experiment.main, ac:850-909): per cumulative collection
  * (size-sorted, ac:585-587), compare approximate search against the
  * exact brute-force oracle (ac:616-633) and score Recall@5/@10
  * (ac:539-564), then aggregate with mean and POPULATION stddev
  * (np.mean/np.std, ac:648-653 — A5/A6; not the speed experiment's
  * sample stddev).
  *
  * The approximate index is LSH rather than HNSW — same contract
  * (approximate top-k, measured recall), different algorithm; recall
  * floors are asserted in ScalaTest the way the reference asserts by
  * publishing its recall curve.
  */
object RecallExperiment {

  /** Per (collection, qid) recall@5/@10 of LSH vs the exact oracle. */
  def run(
      spark: SparkSession,
      base: DataFrame, // (vec_id, seq, embedding)
      queries: DataFrame, // (qid, qemb)
      step: Long,
      topK: Int = 10,
      numHashTables: Int = 8,
      bucketLength: Double = 2.0,
      radius: Double = 5.0): DataFrame = {
    val total = base.count()
    val nColls = ((total + step - 1) / step).toInt
    val perColl = (1 to nColls).map { c =>
      val endIdx = math.min(c * step, total)
      val view = CollectionCatalog.prefixView(base, endIdx)
      // Name by the actual end index (min(c*step, total)) so parsePages
      // agrees with num_documents and with CollectionBuilder.planCollections
      // on the final partial collection.
      val name = f"collection_${c}%04d_${endIdx}%dpages"
      val gt = KnnExact.topK(queries, view, topK)
      val idx = LshIndex.fit(view, numHashTables = numHashTables, bucketLength = bucketLength)
      val approx = idx.topK(queries, view, topK, radius = radius)
      RecallAtK.evaluate(gt, approx, Seq(5, 10))
        .withColumn("collection", lit(name))
        .withColumn("num_documents", lit(endIdx))
    }
    perColl.reduceOption(_ unionByName _).getOrElse {
      // Empty base → zero collections: return an empty frame with the
      // same schema instead of crashing on reduce of an empty list.
      import org.apache.spark.sql.types._
      val schema = StructType(
        StructField("qid", LongType) +:
          Seq(5, 10).map(k => StructField(s"recall_$k", DoubleType)) :+
          StructField("collection", StringType) :+
          StructField("num_documents", LongType))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** A5/A6: per-collection mean recall + population stddev (np.std). */
  def perCollectionStats(recalls: DataFrame): DataFrame =
    recalls.groupBy(col("collection"), col("num_documents"))
      .agg(
        round(avg(col("recall_5")), 4).as("mean_recall_5"),
        round(coalesce(stddev_pop(col("recall_5")), lit(0.0)), 4).as("std_recall_5"),
        round(avg(col("recall_10")), 4).as("mean_recall_10"),
        round(coalesce(stddev_pop(col("recall_10")), lit(0.0)), 4).as("std_recall_10"),
        count(lit(1)).as("n_queries"))
      .orderBy(col("num_documents"))

  /** S9/S10 sinks, mirroring ac:764-808. */
  def save(recalls: DataFrame, stats: DataFrame, outDir: String): Unit = {
    recalls.coalesce(1).write.mode("overwrite").json(s"$outDir/recall_results_json")
    stats.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$outDir/recall_summary_csv")
  }
}
