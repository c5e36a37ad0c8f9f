package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.search.BinaryHash

/** Incremental binary-code maintenance — the streaming twin of
  * [[graft.search.BinaryHash]] (the same twin relationship
  * IndexMaintenance has to IvfIndex.assign). The thresholds are FROZEN
  * (computed once on the base corpus — the production posture
  * BinaryHash's Scaladoc documents: codes and search replay identically
  * from any frozen threshold vector), broadcast into every micro-batch
  * as literals, and each arriving batch of vectors is coded and
  * committed as an overwrite of its own `batch_id=N/` directory — the
  * same idempotent at-least-once-to-exactly-once commit shape as
  * IndexMaintenance.appendBatch.
  *
  * Equivalence contract (the `binary_stream_codes` CORRECTNESS row
  * hash-matches the BATCH oracle): coding is a per-row pure function of
  * the frozen thresholds, so the union of per-batch codes equals the
  * bulk batch coding REGARDLESS of how rows were split into
  * micro-batches.
  */
object BinaryCodeMaintenance {

  /** Code one micro-batch and commit it as a full overwrite of
    * `codesDir/batch_id=<batchId>/` (idempotent under foreachBatch
    * retries — see the object doc).
    */
  def appendBatch(
      batch: DataFrame,
      thr: Array[Long],
      codesDir: String,
      batchId: Long): Unit = {
    batch.select(col("vec_id"),
      BinaryHash.codeWord("embedding", thr, 0).as("code_lo"),
      BinaryHash.codeWord("embedding", thr, 32).as("code_hi"))
      .write
      .mode("overwrite")
      .parquet(s"$codesDir/batch_id=$batchId")
  }

  /** Stream embeddings-shaped parquet from `srcDir`, coding each
    * micro-batch against the frozen thresholds.
    */
  def streamCodes(
      spark: SparkSession,
      srcDir: String,
      codesDir: String,
      checkpointDir: String,
      thr: Array[Long],
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        appendBatch(batch.toDF(), thr, codesDir, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The whole cycle on a batch table: shatter into `nFiles` source
    * files, stream them one per micro-batch, return the final
    * (vec_id, code_lo, code_hi) — materialized off the temp files,
    * which are deleted before returning.
    */
  def maintainFromBatch(
      spark: SparkSession,
      emb: DataFrame,
      thr: Array[Long],
      nFiles: Int = 2): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_bin_maint")
    val srcDir = base.resolve("src").toString
    val codesDir = base.resolve("codes").toString
    val ckptDir = base.resolve("ckpt").toString
    try {
      // source projected to the consumed columns (guide §2.3, r21):
      // coding/assignment reads (vec_id, embedding) only
      emb.select(col("vec_id"), col("embedding"))
        .repartition(nFiles).write.parquet(srcDir)
      val q = streamCodes(spark, srcDir, codesDir, ckptDir, thr)
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(codesDir)
        .select(col("vec_id"), col("code_lo"), col("code_hi"))
        .localCheckpoint(eager = true)
    } finally {
      val p = new Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
