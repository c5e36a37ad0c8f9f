package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-statistics aggregations (SURVEY.md §2.4 A2–A7).
  *
  * The reference aggregates per-(collection, query) run timings with
  * `statistics.mean/median/stdev` (chromadb_speed_experiment.py:495-499)
  * and recalls with `np.mean/np.std` (chromadb_acc_experiment.py:648-653).
  * Two deliberately different std-devs are preserved:
  * - `stddev_samp` (n-1) ≡ statistics.stdev (sp:499), null for n=1 → 0.0
  *   via coalesce, matching the reference's n==1 guard;
  * - `stddev_pop` (n) ≡ np.std (ac:649) — mixing them drifts the numbers
  *   (SURVEY.md §7.4).
  *
  * All are single-shuffle hash aggregations with map-side partial
  * aggregation — the shape that scales.
  */
object LatencyStats {

  /** Per-group count/mean/median/stddevs, rounded for oracle parity.
    *
    * The mean goes through an exact DECIMAL sum (fixture values carry 2
    * decimals): a float sum's partial-aggregation order differs between
    * engines, and when the true mean lands exactly on a round-half
    * boundary the engines disagree; decimal sum → one deterministic
    * double division removes the ambiguity.
    */
  def stats(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol)
    val decSum = sum(v.cast("decimal(18,2)")).cast("double")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        round(decSum / count(lit(1)), 4).as("mean_v"),
        round(median(v), 4).as("median_v"),
        round(coalesce(stddev_samp(v), lit(0.0)), 4).as("std_samp_v"),
        round(coalesce(stddev_pop(v), lit(0.0)), 4).as("std_pop_v"))
      .orderBy(groupCols.map(col): _*)
  }

  /** Grand mean across groups (A7): mean of per-group means — the
    * two-stage aggregation used for the reference's per-collection plot
    * points (chromadb_speed_experiment.py:540-548).
    */
  def grandMean(df: DataFrame, innerGroup: Seq[String], outerGroup: Seq[String], valueCol: String): DataFrame =
    df.groupBy((innerGroup ++ outerGroup).distinct.map(col): _*)
      .agg((sum(col(valueCol).cast("decimal(18,2)")).cast("double") / count(lit(1))).as("group_mean"))
      .groupBy(outerGroup.map(col): _*)
      .agg(round(avg(col("group_mean")), 4).as("grand_mean"), count(lit(1)).as("n_groups"))
      .orderBy(outerGroup.map(col): _*)
}
