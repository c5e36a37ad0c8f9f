package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregation keys: two-stage salted
  * aggregation. Stage 1 groups by (key, salt) — a skewed key's rows
  * spread over `saltBuckets` reducers instead of one — stage 2 merges
  * the partials by key. Correct for any algebraic aggregate (sum, count,
  * min, max; avg = sum/count).
  *
  * AQE's skew-join splitting handles *join* skew at runtime; aggregation
  * skew still needs this shape when one key holds a large fraction of
  * all rows (the classic null-key / default-value hot spot in training
  * -data pipelines).
  *
  * The salt is deterministic (hash of stable columns mod buckets), not
  * random — reruns and retried tasks produce identical partials.
  */
object Salting {

  def withSalt(df: DataFrame, saltFrom: Seq[String], saltBuckets: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom.map(col): _*), lit(saltBuckets)))

  /** Salted sum+count per key (extend with more algebraic partials as
    * needed). Output: keyCols, sum_<valueCol>, count.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltFrom: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    val partial = withSalt(df, saltFrom, saltBuckets)
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcount"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcount")).as("count"))
  }

  /** Salted distinct count per key: stage 1 dedupes (key, salt, value)
    * locally, stage 2 counts — the exact-distinct analog of the same
    * spreading trick (approx_count_distinct needs no salt; its sketch
    * merges are already balanced).
    */
  def saltedCountDistinct(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    // count_distinct ignores NULLs — drop them up front so the salted
    // form stays an exact analog on null-bearing columns
    val partial = withSalt(df.filter(col(valueCol).isNotNull), Seq(valueCol), saltBuckets)
      .select((keyCols :+ "__salt" :+ valueCol).map(col): _*)
      .distinct()
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__pdistinct"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__pdistinct")).as(s"n_distinct_$valueCol"))
  }
}
