package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible global shuffle for training-data ordering.
  *
  * LLM training wants the corpus in a pseudo-random but EXACTLY
  * reproducible order, materialized as N shard files whose concatenation
  * is the epoch order. Engine-side that is: a deterministic hash key per
  * row (xor-folded Knuth multiplicative — no RNG, no seed state to
  * lose), shard = h mod N, and position = rank within shard by (h, id).
  * One exchange on shard, one in-shard sort — the plan a 1000-executor
  * job wants: each executor sorts its shard independently, nothing
  * global.
  *
  * Hash construction (every step BIGINT-exact in Spark AND DuckDB, and
  * overflow-free under ANSI arithmetic for ANY non-negative id — the
  * naive `id * 2654435761 % 2^20` both overflows past id ≈ 3.5e9 and
  * depends only on id's low 20 bits, so a corpus over ~1M rows would
  * degenerate into a periodic strided order):
  *
  *   1. fold:   x = id ^ (id >> 20) ^ (id >> 40) — mixes bits 20-59
  *      into the low 20, so ids congruent mod 2^20 no longer collide;
  *   2. reduce: y = x mod 2^20 (x is non-negative for non-negative id);
  *   3. mix:    h = (y * 2654435761) >> 32 — the HIGH 20 bits of a
  *      ≤52-bit product (no overflow), which breaks the linear stride a
  *      low-bits multiplicative hash leaves in consecutive ids.
  *
  * Contract: ids must be non-negative (both engines' `>>` is an
  * arithmetic shift and `%` follows sign, so negative ids would
  * disagree; every fixture id is a non-negative key).
  *
  * A tie on h falls back to the id, so the order is total and identical
  * on any engine/partitioning.
  */
object ReproShuffle {

  val HashMult = 2654435761L // Knuth multiplicative constant (2^32 / φ)
  val HashMod = 1048576L // 2^20 buckets: collisions are fine (id tiebreak)

  /** The portable per-id hash above as a Column: h ∈ [0, 2^20), exact in
    * Spark and DuckDB for any non-negative long id. Shared by the
    * shuffle (shard/pos) and [[HashSplit]] (train/val/test assignment).
    */
  def portableHash(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val id = idCol.cast("long")
    val folded = id.bitwiseXOR(shiftright(id, 20)).bitwiseXOR(shiftright(id, 40))
    shiftright((folded % lit(HashMod)) * lit(HashMult), 32)
  }

  /** Adds (shard, pos) to df: shard ∈ [0, nShards), pos = 1-based rank
    * inside the shard in shuffled order.
    */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    df.withColumn("__h", portableHash(col(idCol)))
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
