package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Greedy sequence packing: assign ordered documents to fixed-budget
  * context windows ("bins") without splitting documents — the standard
  * pretraining step that turns a token-counted corpus into ~budget-sized
  * training sequences. A document larger than the budget gets a bin of
  * its own; a new document opens a new bin exactly when it would
  * overflow the current one.
  *
  * Packing is inherently sequential WITHIN a group (each bin decision
  * depends on the running total), so the unit of parallelism is the
  * group: one hash exchange on the group column, a per-partition sort,
  * then a single O(1)-state forward scan per group (`mapPartitions` —
  * the documented last-resort case: no Catalyst operator expresses a
  * running reset). At 100 TB the group is the shard key a real pipeline
  * packs within anyway (language × shard), so every executor packs its
  * groups independently with constant memory; nothing is collected and
  * no group is materialized as a whole.
  */
object Packing {

  /** Adds `bin_id` (0-based per group) to `df`. Rows are packed in
    * (groupCol, orderCol) order; `weightCol` must be a non-negative
    * integral column. Deterministic: hash-partition on the group keeps
    * each group whole, the partition-local sort makes groups contiguous,
    * and the scan resets state on every group-boundary row.
    */
  def packGreedy(df: DataFrame, groupCol: String, orderCol: String,
                 weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val out = df.schema.add("bin_id", LongType, nullable = false)
    val gi = df.schema.fieldIndex(groupCol)
    val wi = df.schema.fieldIndex(weightCol)
    df.repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .mapPartitions { it =>
        var curGroup: Any = null
        var started = false
        var bin = 0L
        var cum = 0L
        it.map { r =>
          val g = r.get(gi)
          if (!started || g != curGroup) {
            started = true; curGroup = g; bin = 0L; cum = 0L
          }
          val n = r.getAs[Number](wi).longValue()
          if (cum > 0 && cum + n > budget) { bin += 1; cum = 0L }
          cum += n
          Row.fromSeq(r.toSeq :+ bin)
        }
      }(Encoders.row(out))
  }
}
