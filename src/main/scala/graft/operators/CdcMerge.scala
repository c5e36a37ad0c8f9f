package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge: apply a batch of keyed upserts/deletes to a
  * base snapshot, producing the next snapshot (the Delta/Iceberg MERGE
  * semantics, expressed engine-neutrally on immutable storage).
  *
  * Input contract:
  *  - `base`: the current snapshot, one row per `key`.
  *  - `changes`: the change batch — columns = base columns plus
  *    `_op` ('u' upsert | 'd' delete) and `_seq` (long, change order).
  *    Multiple changes per key are allowed; the highest `_seq` wins
  *    (ties broken by `_op`: max over the (_seq, _op) struct means
  *    'u' > 'd' lexicographically, so an upsert at the same seq wins —
  *    a tie is a producer bug, but the output must still be stable).
  *
  * Plan shape: union(base as _seq = -1 upserts, changes) → one hash
  * exchange on `key` → per-key max_by struct → filter deletes. Exactly
  * one shuffle of (base + changes); no join. At 100 TB the base is
  * bucketed/partitioned by `key`, the change batch is orders of magnitude
  * smaller, and this becomes a shuffle of the changes plus a co-located
  * scan of the base — the standard LSM-style snapshot roll-forward.
  * Reference analog: the cumulative re-add loop (create_collections.py:
  * 237-268) rebuilds collections by replaying all rows; this is the
  * incremental form a mutable catalog needs.
  */
object CdcMerge {

  /** Merge `changes` into `base` on `key`; returns the next snapshot
    * with the base's columns.
    */
  def merge(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val cols = base.columns.toSeq
    val versioned = base
      .withColumn("_op", lit("u"))
      .withColumn("_seq", lit(-1L))
      .unionByName(changes.select((cols :+ "_op" :+ "_seq").map(col): _*))
    val payload = struct(cols.map(col): _*)
    versioned
      .groupBy(col(key))
      .agg(max_by(struct(col("_op"), payload.as("row")), struct(col("_seq"), col("_op"))).as("w"))
      .filter(col("w._op") === "u")
      .select(cols.map(c => col(s"w.row.$c").as(c)): _*)
  }
}
