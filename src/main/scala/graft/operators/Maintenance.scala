package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}

/** Table-maintenance operators for the landing/bronze layer: small-file
  * compaction and stats-friendly sorted writes. Streaming sinks and
  * per-batch appends produce many small files; 100 TB scans pay for
  * every file open, and parquet min/max row-group skipping only works
  * when rows arrive sorted by the filter key.
  */
object Maintenance {

  /** Total bytes of the parquet files under a directory (metadata-only). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
  }

  /** Compact a parquet directory to ~targetBytes output files: read,
    * coalesce (no shuffle — merges input splits), overwrite a new
    * location. Returns the new file count.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String, targetBytes: Long): Int = {
    val n = math.max(1L, (dataBytes(spark, inDir) + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val p = new Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
  }

  /** Write range-partitioned by `key` and sorted within partitions:
    * each output file covers a disjoint key range, so parquet min/max
    * row-group stats prune scans with a `key` predicate to ~one file.
    */
  def writeSortedByKey(df: DataFrame, outDir: String, key: String, partitions: Int): Unit =
    df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** Key-bucketed layout: rows land in `__kb = xxhash64(key) mod n`
    * directory partitions. The point is [[deleteKeys]]: a right-to-be-
    * forgotten delete touches ONLY the buckets holding the keys — at
    * 100 TB that is a rewrite of keys/n of the table, not all of it.
    */
  def writeKeyBucketed(df: DataFrame, outDir: String, key: String, nBuckets: Int): Unit =
    df.withColumn("__kb", pmod(xxhash64(col(key)), lit(nBuckets)))
      .write.partitionBy("__kb").mode(SaveMode.Overwrite).parquet(outDir)

  /** Surgical key deletion from a [[writeKeyBucketed]] table: compute
    * the affected buckets (same hash, via a one-row-per-key frame so the
    * bucketing function is engine-identical), rewrite ONLY those bucket
    * directories through a staged swap, and leave every other bucket's
    * files untouched. Returns the number of deleted rows.
    */
  def deleteKeys(
      spark: SparkSession,
      dir: String,
      key: String,
      keys: Seq[Long],
      nBuckets: Int): Long = {
    import spark.implicits._
    if (keys.isEmpty) return 0L
    val keyDf = keys.toDF(key)
    val buckets = keyDf
      .select(pmod(xxhash64(col(key)), lit(nBuckets)).as("kb"))
      .distinct().as[Long].collect().sorted
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    var deleted = 0L
    buckets.foreach { b =>
      val bucketPath = new Path(dir, s"__kb=$b")
      if (fs.exists(bucketPath)) {
        val before = spark.read.parquet(bucketPath.toString)
        val kept = before.join(keyDf, Seq(key), "left_anti")
        val keptN = kept.count()
        deleted += before.count() - keptN
        val stage = new Path(dir, s"__kb=${b}__stage")
        kept.write.mode(SaveMode.Overwrite).parquet(stage.toString)
        fs.delete(bucketPath, true)
        fs.rename(stage, bucketPath)
      }
    }
    deleted
  }
}
