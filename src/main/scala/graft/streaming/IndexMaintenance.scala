package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas

/** Incremental ANN-index maintenance — the streaming twin of the IVF
  * build path (`search/IvfIndex.assign`). The reference builds its index
  * in one bulk pass (chromadb_speed_experiment.py batch-inserts into a
  * ChromaDB collection); a production corpus is APPENDED to, so the
  * index must absorb new vectors without rebuilding.
  *
  * Shape: the centroid codebook is FROZEN (trained once on the base
  * corpus, broadcast — retraining per batch would re-shuffle every
  * existing cell), and each arriving micro-batch of vectors is assigned
  * to its nearest cell and appended to the index table. At 100 TB the
  * appended table is partitioned by cell id, so this IS the physical
  * partition-pruned layout ann_ivf_top5 probes; per-batch work is
  * O(batch × k) with no shuffle wider than the batch, and the stream
  * carries no state at all — the checkpoint's file ledger is the only
  * bookkeeping, which is what makes the append idempotent under retry
  * (exactly-once file-source semantics).
  *
  * Equivalence contract (pinned in IndexMaintenanceSpec and the
  * `ann_index_stream_append` CORRECTNESS row): because assignment is
  * per-row and the codebook is frozen, the union of per-batch
  * assignments equals the bulk batch assignment REGARDLESS of how rows
  * were split into micro-batches.
  */
object IndexMaintenance {

  /** Stream embeddings-shaped parquet files from `srcDir` and append
    * each micro-batch's (vec_id, cell, batch_id) cell assignments to
    * the parquet index table at `indexDir`. `centroids` must be a
    * small (cid, cemb) frame — it is broadcast into every batch's
    * assignment join. batch_id is retained so tests can prove the
    * incremental path actually ran more than one batch.
    */
  def streamIndexAppend(
      spark: SparkSession,
      srcDir: String,
      indexDir: String,
      checkpointDir: String,
      centroids: DataFrame,
      maxFilesPerTrigger: Int = 1,
      glob: String = "*.parquet"): StreamingQuery = {
    spark.readStream
      .schema(Schemas.embeddings)
      .option("pathGlobFilter", glob)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.search.IvfIndex.assign(batch, centroids)
          .select(col("vec_id"), col("cell"), lit(batchId).as("batch_id"))
          .write.mode("append").parquet(indexDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Run the whole maintenance cycle on a batch table: shatter `emb`
    * into `nFiles` source files under a temp dir, stream them through
    * [[streamIndexAppend]] one file per micro-batch, and return the
    * final index table (vec_id, cell, batch_id). The caller projects
    * away batch_id when determinism matters — WHICH batch a vector
    * landed in depends on the repartition split; its cell does not.
    */
  def maintainFromBatch(
      spark: SparkSession,
      emb: DataFrame,
      centroids: DataFrame,
      nFiles: Int = 4): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_idx_maint")
    val srcDir = base.resolve("src").toString
    val indexDir = base.resolve("index").toString
    val ckptDir = base.resolve("ckpt").toString
    emb.repartition(nFiles).write.parquet(srcDir)
    val q = streamIndexAppend(spark, srcDir, indexDir, ckptDir, centroids)
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(indexDir)
  }
}
