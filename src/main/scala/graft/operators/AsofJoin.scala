package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: attach to each left row the payload of the
  * right row with the greatest timestamp STRICTLY before the left row's
  * timestamp, within the same key (the classic "latest quote before each
  * trade" operator — kdb+ `aj`, DuckDB/Pandas ASOF JOIN). Spark has no
  * native as-of join; the reference engine family exposes it through its
  * time-series layer, and training-data pipelines use it to stamp events
  * with the latest preceding model/config snapshot.
  *
  * Implementation is the scalable union-and-window form, NOT a range
  * join: tag both inputs, union them, and carry the last right-payload
  * forward with `last(_, ignoreNulls)` over a
  * (key, ts, side)-ordered running window. One shuffle on the key, no
  * join node at all — a naive `l.ts > r.ts` range join degenerates to a
  * per-key cartesian (O(|L|·|R|) per key) that no 1000-executor cluster
  * survives on 100 TB, while this plan is a single Exchange + sort, the
  * same cost as any windowed aggregation (pinned in PlanSpec: no
  * Join/BNLJ/cartesian in the physical plan).
  *
  * Strictness: left rows sort BEFORE right rows at equal timestamps
  * (side 0 < side 1), so an equal-ts right row is not yet visible to the
  * running `last` — exactly `l.ts > r.ts`. The right side must be unique
  * per (key, ts) (pre-aggregate upstream; with ties the carried payload
  * would depend on sort nondeterminism).
  *
  * Output: every left column, then `asof_<ts>` and `asof_<payload>`
  * columns (all null when no strictly-prior right row exists — left
  * outer semantics).
  */
object AsofJoin {

  def strictPrior(left: DataFrame, right: DataFrame, key: String, ts: String,
                  rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right payload travels as ONE struct (ts first): `last` with
    // ignoreNulls skips union-side nulls but must NOT skip a matched row
    // whose payload VALUE is null — the enclosing struct is non-null for
    // every right row, so null payload fields survive intact.
    val l2 = left.withColumn("_side", lit(0))
    val r2 = right.select(
      col(key), col(ts), lit(1).as("_side"),
      struct(col(ts).as(s"asof_$ts") +:
        rightPayload.map(c => col(c).as(s"asof_$c")): _*).as("_asof"))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_matched", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(leftCols.map(col) ++
        (s"asof_$ts" +: rightPayload.map(c => s"asof_$c"))
          .map(f => col(s"_matched.$f").as(f)): _*)
  }
}
