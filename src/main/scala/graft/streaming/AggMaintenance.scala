package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental maintenance of a materialized rollup — the streaming
  * twin of the summary tables [[graft.plans.AggRewrite]] serves (the
  * same twin relationship IndexMaintenance has to the IVF build): facts
  * arrive in micro-batches, and the rollup must absorb them WITHOUT
  * re-scanning history.
  *
  * Shape: each micro-batch reduces to its own PARTIAL rollup — one row
  * per touched group carrying the re-aggregable measure set
  * (count / integral sum / min / max) — committed as an overwrite of
  * its `batch_id=N/` directory (the idempotent at-least-once-to-
  * exactly-once commit IndexMaintenance uses). Reading the view
  * re-aggregates the partials: SUM of counts/sums, MIN of mins, MAX of
  * maxes — the merge is associative and commutative, so the result
  * equals the bulk groupBy REGARDLESS of how facts were split into
  * batches (the `agg_stream_maintain` CORRECTNESS row hash-matches the
  * direct batch oracle). [[compactRollup]] folds the batch history into
  * one partial — the small-files answer, equivalence by the same
  * associativity.
  *
  * At 100 TB: per-batch work is one batch-sized groupBy (no history
  * read, no state store — the partials ARE the state), the view read is
  * |groups|·|batches| rows shrinking to |groups| after compaction, and
  * the compacted table is exactly what AggRewrite registers.
  */
object AggMaintenance {

  /** Reduce one micro-batch to its partial rollup and commit it as a
    * full overwrite of `rollupDir/batch_id=<batchId>/`.
    */
  def appendBatch(
      batch: DataFrame,
      groupCols: Seq[String],
      rollupDir: String,
      batchId: Long): Unit = {
    batch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"),
        min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"))
      .write
      .mode("overwrite")
      .parquet(s"$rollupDir/batch_id=$batchId")
  }

  /** The maintained view: re-aggregate the per-batch partials (the
    * associative merge — exact for this measure algebra).
    */
  def readView(spark: SparkSession, rollupDir: String, groupCols: Seq[String]): DataFrame =
    spark.read.parquet(rollupDir)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_ok")).as("sum_ok"),
        min(col("min_qty")).as("min_qty"), max(col("max_qty")).as("max_qty"))

  /** Fold the batch history into ONE partial (small-files compaction);
    * the compacted dir reads identically through [[readView]].
    */
  def compactRollup(spark: SparkSession, rollupDir: String, outDir: String,
      groupCols: Seq[String]): Unit =
    readView(spark, rollupDir, groupCols)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=0")

  /** Stream lineitem-shaped parquet from `srcDir`, maintaining the
    * rollup one micro-batch at a time.
    */
  def streamRollup(
      spark: SparkSession,
      srcDir: String,
      rollupDir: String,
      checkpointDir: String,
      groupCols: Seq[String],
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        appendBatch(batch.toDF(), groupCols, rollupDir, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The whole cycle on a batch table: shatter into `nFiles` source
    * files, stream them one per micro-batch, return the final view
    * (materialized; temp files deleted before returning).
    */
  def maintainFromBatch(
      spark: SparkSession,
      facts: DataFrame,
      groupCols: Seq[String],
      nFiles: Int = 3): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_agg_maint")
    val srcDir = base.resolve("src").toString
    val rollupDir = base.resolve("rollup").toString
    val ckptDir = base.resolve("ckpt").toString
    try {
      facts.repartition(nFiles).write.parquet(srcDir)
      val q = streamRollup(spark, srcDir, rollupDir, ckptDir, groupCols)
      try q.processAllAvailable() finally q.stop()
      readView(spark, rollupDir, groupCols).localCheckpoint(eager = true)
    } finally {
      val p = new Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  // ---- join-view maintenance (the AGGREGATE JOIN VIEW's stream twin) ----

  /** Incremental maintenance of an AGGREGATE JOIN VIEW — the streaming
    * twin of [[graft.plans.AggRewrite.registerJoin]]'s star-schema
    * rollup: FACT rows arrive in micro-batches, the DIMENSION is a
    * static broadcastable table, and the maintained view must equal
    * the bulk `facts ⋈ dim groupBy` at every point.
    *
    * Why this decomposes exactly: an inner equi-join distributes over
    * row-disjoint unions of the fact side —
    * `(⋃ batches) ⋈ dim = ⋃ (batch ⋈ dim)` — so each micro-batch joins
    * ONLY ITS OWN rows against the dim (a broadcast hash join, no
    * shuffle of history) and reduces to a partial rollup; the view
    * re-aggregates the partials with the same associative merge the
    * single-table twin uses. Per-batch work is O(batch) regardless of
    * history size — at 100 TB the alternative is re-joining the whole
    * fact table every refresh, which is exactly what warehouse
    * incremental-view-maintenance exists to avoid.
    */
  def appendJoinBatch(
      batch: DataFrame,
      dim: DataFrame,
      joinCond: org.apache.spark.sql.Column,
      groupCols: Seq[String],
      rollupDir: String,
      batchId: Long): Unit = {
    batch.join(org.apache.spark.sql.functions.broadcast(dim), joinCond)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("l_linenumber")).as("sum_ln"),
        min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"))
      .write
      .mode("overwrite")
      .parquet(s"$rollupDir/batch_id=$batchId")
  }

  /** Re-aggregate the per-batch join partials (associative merge). */
  def readJoinView(spark: SparkSession, rollupDir: String,
      groupCols: Seq[String]): DataFrame =
    spark.read.parquet(rollupDir)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_ln")).as("sum_ln"),
        min(col("min_qty")).as("min_qty"), max(col("max_qty")).as("max_qty"))

  /** The whole join-view cycle on batch tables: shatter the facts,
    * stream them one file per micro-batch against the static dim,
    * return the final view.
    */
  def maintainJoinFromBatch(
      spark: SparkSession,
      facts: DataFrame,
      dim: DataFrame,
      joinCond: org.apache.spark.sql.Column,
      groupCols: Seq[String],
      nFiles: Int = 3): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_aggjoin_maint")
    val srcDir = base.resolve("src").toString
    val rollupDir = base.resolve("rollup").toString
    val ckptDir = base.resolve("ckpt").toString
    try {
      facts.repartition(nFiles).write.parquet(srcDir)
      val dimStatic = dim.localCheckpoint(eager = true) // joined once per batch
      val schema = spark.read.parquet(srcDir).schema
      val q = spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          appendJoinBatch(batch.toDF(), dimStatic, joinCond, groupCols,
            rollupDir, batchId)
          ()
        }
        .option("checkpointLocation", ckptDir)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
      val view = readJoinView(spark, rollupDir, groupCols)
        .localCheckpoint(eager = true)
      dimStatic.unpersist(blocking = false)
      view
    } finally {
      val p = new Path(base.toString)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
