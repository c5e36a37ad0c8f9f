package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible global shuffle for training-data ordering.
  *
  * LLM training wants the corpus in a pseudo-random but EXACTLY
  * reproducible order, materialized as N shard files whose concatenation
  * is the epoch order. Engine-side that is: a deterministic hash key per
  * row (Knuth multiplicative, the same family the temperature-mix coin
  * uses — no RNG, no seed state to lose), shard = h mod N, and position
  * = rank within shard by (h, id). One exchange on shard, one in-shard
  * sort — the plan a 1000-executor job wants: each executor sorts its
  * shard independently, nothing global.
  *
  * A tie on h falls back to the id, so the order is total and identical
  * on any engine/partitioning.
  */
object ReproShuffle {

  val HashMult = 2654435761L
  val HashMod = 1048576L // 2^20 buckets: collisions are fine (id tiebreak)

  /** Adds (shard, pos) to df: shard ∈ [0, nShards), pos = 1-based rank
    * inside the shard in shuffled order.
    */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    val h = (col(idCol) * lit(HashMult)) % lit(HashMod)
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("long"))
      .withColumn("pos",
        row_number().over(Window.partitionBy(col("shard"))
          .orderBy(col("__h"), col(idCol))).cast("long"))
      .drop("__h")
  }

  /** Materialize the shuffle: one directory per shard, rows sorted in
    * epoch order within each shard, file sizes bounded so the downstream
    * loader never sees a monolithic file (the small-files/huge-files
    * control at 100 TB: maxRecordsPerFile splits, repartition(shard)
    * guarantees one writer task per shard).
    */
  def write(df: DataFrame, idCol: String, nShards: Int, outDir: String,
            maxRecordsPerFile: Long = 1000000L): Unit =
    assign(df, idCol, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(outDir)
}
