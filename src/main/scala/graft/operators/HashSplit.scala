package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based train/val/test assignment — the split
  * primitive a training-data pipeline needs instead of `randomSplit`.
  *
  * Why not randomSplit: a random split is a property of one RUN (seed +
  * partitioning), so re-materializing the corpus reshuffles documents
  * across splits and leaks val/test content into training. Hashing the
  * stable document id makes the split a property of the DOCUMENT:
  * adding, removing, or re-ordering other documents never moves an
  * existing one between splits, any engine recomputes the identical
  * assignment (the hash is BIGINT-exact in Spark and DuckDB — see
  * [[ReproShuffle]] for the arithmetic contract), and downstream eval
  * sets stay frozen as the corpus grows. Per-row codegen'd expression
  * work: no shuffle, no state, scan-parallel at any scale.
  *
  * The reference has no split step (its experiments query the full
  * corpus, chromadb_acc_experiment.py:857-863); this generalizes its
  * corpus handling the same way the dedup family does.
  *
  * Bucket granularity is percent (bucket = h % 100): coarse enough to
  * be readable in oracles, fine enough for 90/5/5. h is uniform on
  * [0, 2^20) so each bucket holds ~1% ± the 2^20 mod 100 remainder
  * bias (≤ 1/10486 relative — irrelevant at any corpus size).
  */
object HashSplit {

  /** Adds (bucket, split) to df: bucket = portableHash(id) % 100,
    * split = "train" if bucket < trainPct, "val" if bucket <
    * trainPct + valPct, else "test".
    */
  def assign(df: DataFrame, idCol: String,
             trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct and trainPct + valPct < 100, got $trainPct/$valPct")
    val bucket = ReproShuffle.portableHash(col(idCol)) % lit(100L)
    df.withColumn("bucket", bucket)
      .withColumn("split", splitLabel(col("bucket"), trainPct, valPct))
  }

  def splitLabel(bucket: Column, trainPct: Int, valPct: Int): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
}
