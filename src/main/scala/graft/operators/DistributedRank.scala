package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without a single-partition sort.
  *
  * `Window.orderBy(x)` with no partition is the classic scale-killer: the
  * whole table funnels through ONE task (Spark even logs
  * "WindowExec: No Partition Defined"). The standard distributed-rank
  * shape used here instead:
  *
  *   1. one `approxQuantile` pass picks ~`buckets` range cut points
  *      (driver receives `buckets-1` doubles — bounded by the bucket
  *      count, never by data size);
  *   2. each row's bucket id is a PURE FUNCTION of its value (a chain of
  *      `when(value > cut)` comparisons), so re-evaluation is
  *      deterministic — no RangePartitioner sampling whose boundaries
  *      could drift between the count job and the rank job;
  *   3. a count per bucket (one map-side-combined aggregation; driver
  *      receives ≤ `buckets` rows) yields each bucket's global row
  *      offset;
  *   4. rank = bucket offset + `row_number` over a window PARTITIONED by
  *      bucket — a partition-parallel sort of ~1/buckets of the data
  *      per task.
  *
  * Approximation error in the cuts only skews bucket SIZES (bounded by
  * the quantile relativeError), never rank correctness: whatever the
  * cuts, offset + local row number is the exact global row number,
  * because bucketing preserves the value order and ties on the value
  * column stay within one bucket (tie order is then resolved by the
  * in-bucket sort on (value, tie)).
  */
object DistributedRank {

  /** Adds exact global `row_number() over (order by valueCol, tieCol)` as
    * `outCol`; returns (ranked df, total row count). (valueCol, tieCol)
    * must be unique per row — rank functions beyond row_number collapse
    * onto it when the order is total. Runs two bounded driver actions at
    * plan-build time (quantile cuts, bucket counts).
    */
  def withGlobalRowNumber(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      outCol: String,
      buckets: Int = 32): (DataFrame, Long) = {
    val spark = df.sparkSession
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val cuts = df.stat.approxQuantile(valueCol, probs, 0.001).distinct.sorted
    val pid = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(valueCol) > lit(c), 1).otherwise(0)
    }
    val tagged = df.withColumn("__pid", pid)
    val countRows = tagged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val total = countRows.map(_._2).sum
    val offsets = countRows.map(_._1)
      .zip(countRows.scanLeft(0L)(_ + _._2).dropRight(1))
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val w = Window.partitionBy(col("__pid")).orderBy(col(valueCol), col(tieCol))
    val ranked = tagged.join(offDf, "__pid")
      .withColumn(outCol, col("__offset") + row_number().over(w).cast("long"))
      .drop("__pid", "__offset")
    (ranked, total)
  }
}
