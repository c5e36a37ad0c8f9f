package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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
}
