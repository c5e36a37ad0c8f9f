package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.textual.Bpe

/** Streaming tokenization against a FROZEN tokenizer — the production
  * shape for applying a trained BPE vocabulary to documents as they
  * arrive (the tokenizer never retrains per batch; it is versioned
  * corpus-level state, exactly like the frozen centroid codebook in
  * `IndexMaintenance`). Completes the streaming-twin rectangle: IVF
  * cells, dedup postings, HNSW segments, and now the tokenizer —
  * every index-like artifact this engine ships has an apply-on-stream
  * path.
  *
  * Shape: each micro-batch stream-static joins its documents against
  * the final word→symbols table from `Bpe.trainMerges` and appends
  * per-doc token/subtoken stats. Tokenization is per-doc pure, so the
  * union of per-batch outputs equals the batch result REGARDLESS of
  * how docs were split into batches (batching-invariance — the
  * `bpe_stream_tokenize` CORRECTNESS row hash-matches the same oracle
  * as the batch row). foreachBatch is at-least-once; each batch
  * overwrites its own `batch_id=N/` directory, so replays replace
  * rather than duplicate (the IndexMaintenance commit discipline).
  */
object TokenizeMaintenance {

  /** Generic frozen-tokenizer stream: each micro-batch of documents
    * runs `perBatch` (a pure per-doc stats transform against a frozen
    * vocabulary table) and appends to its own `batch_id=N/` directory —
    * the shared machinery both tokenizer families (BPE merges, unigram
    * LM) ride, so the streaming twins cannot drift from each other.
    */
  def streamStats(
      spark: SparkSession,
      srcDir: String,
      outDir: String,
      checkpointDir: String,
      perBatch: DataFrame => DataFrame,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    // schema from the source files themselves (one footer read): the
    // shatter may be projected to the consumed columns, and a frozen
    // 5-column schema over 2-column files would resolve the rest to null
    spark.readStream
      .schema(spark.read.parquet(srcDir).schema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        perBatch(batch.toDF())
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  def streamTokenizeStats(
      spark: SparkSession,
      srcDir: String,
      outDir: String,
      checkpointDir: String,
      vocab: DataFrame,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    streamStats(spark, srcDir, outDir, checkpointDir,
      batch => Bpe.tokenizeStats(batch, "text", "doc_id", vocab),
      maxFilesPerTrigger)

  /** Shared shatter→stream→union cycle: write `docs` as `nFiles`
    * source files, drain the AvailableNow stream through `perBatch`,
    * return the unioned per-batch outputs projected to `outCols`.
    * Temp dirs are deleted before returning.
    */
  private def maintainWith(
      spark: SparkSession,
      docs: DataFrame,
      perBatch: DataFrame => DataFrame,
      outCols: Seq[String],
      nFiles: Int): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_tok_maint")
    val srcDir = base.resolve("src").toString
    val outDir = base.resolve("out").toString
    val ckptDir = base.resolve("ckpt").toString
    try {
      // Source-side column pruning (guide §2.3): both tokenizer stats
      // transforms consume exactly (doc_id, text) — shattering the other
      // document columns into the source files just made the write and
      // every micro-batch read carry dead bytes.
      docs.select(col("doc_id"), col("text"))
        .repartition(nFiles).write.parquet(srcDir)
      val q = streamStats(spark, srcDir, outDir, ckptDir, perBatch)
      try q.processAllAvailable() finally q.stop()
      spark.read.parquet(outDir)
        .select(outCols.map(col): _*)
        .localCheckpoint(eager = true)
    } finally {
      val p = new Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  /** Run the whole BPE cycle on a batch table: shatter `docs` into
    * `nFiles` source files, stream them through the frozen vocab, and
    * return the unioned per-doc stats.
    */
  def maintainFromBatch(
      spark: SparkSession,
      docs: DataFrame,
      vocab: DataFrame,
      // 2 micro-batches: tokenization is per-doc pure, so batching
      // invariance holds by construction (spec-proven at 3 too) — two
      // batches exercise the append path at half the commit cost
      nFiles: Int = 2): DataFrame =
    maintainWith(spark, docs,
      batch => Bpe.tokenizeStats(batch, "text", "doc_id", vocab),
      Seq("doc_id", "n_tokens", "n_subtokens"), nFiles)

  /** The UNIGRAM twin: stream documents against the frozen word→pieces
    * segmentation table (Viterbi under the trained unigram LM —
    * [[graft.textual.UnigramLm.segmentation]]), appending per-doc
    * word/piece stats per micro-batch. Segmentation is per-doc pure
    * under a frozen vocab, so the streamed union equals the batch
    * result regardless of the batch split — the same hash-match
    * contract as the BPE twin, completing the tokenizer-family
    * streaming symmetry.
    */
  def maintainUnigramFromBatch(
      spark: SparkSession,
      docs: DataFrame,
      seg: DataFrame,
      nFiles: Int = 2): DataFrame =
    maintainWith(spark, docs,
      batch => graft.textual.UnigramLm.tokenizeStats(batch, "text", "doc_id", seg),
      Seq("doc_id", "n_words", "n_pieces", "pieces_per_word"), nFiles)
}
