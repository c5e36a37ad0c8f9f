package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate and sampling operators — the sketches that replace their
  * exact counterparts once a column no longer fits one machine.
  *
  * These are deliberately NOT in the DuckDB oracle surface: sketch
  * implementations (HLL/KLL parameters, RNG streams) are engine-specific,
  * so correctness is asserted as error bounds against the exact answer
  * in ApproxOpsSpec — the same contract the reference uses for its
  * approximate index (recall floor vs the brute-force oracle).
  */
object ApproxOps {

  /** HyperLogLog++ distinct count per group (rsd = target relative
    * standard deviation). At 100 TB this is THE way to count distincts:
    * fixed-size sketch per group, partial-merged map-side, no
    * shuffle-the-world distinct.
    */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /** Oracle-verifiable form of [[approxDistinct]]: per group, the EXACT
    * distinct count plus a boolean asserting the HLL++ estimate landed
    * within 3·rsd of it. Sketch estimates are engine-specific, so the
    * raw estimate can never hash-match a DuckDB oracle — but the exact
    * count and the error-bound verdict can (oracle: exact counts +
    * literal TRUE), which turns the error bound itself into a
    * per-run, per-group correctness assertion instead of a spec-only
    * one. The exact count alongside is what makes the check honest:
    * if the sketch drifted out of bound, within_bound flips false and
    * the driver's hash compare fails loudly.
    */
  def approxDistinctVerified(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count_distinct(col(valueCol)).as("n_exact"),
        approx_count_distinct(col(valueCol), rsd).as("n_approx"))
      .select(groupCols.map(col) :+ col("n_exact") :+
        when(col("n_exact") === 0, col("n_approx") === 0)
          .otherwise(abs(col("n_approx") - col("n_exact")).cast("double") /
            col("n_exact") <= lit(3 * rsd))
          .as("within_bound"): _*)

  /** KLL-style approximate quantiles (percentile_approx): one pass,
    * bounded memory, vs the exact percentile's full sort.
    */
  def approxQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(col(valueCol),
      array(probs.map(lit): _*), lit(accuracy)).as(s"approx_q_$valueCol")

  /** Deterministic, engine-portable hash sample: keep rows whose md5
    * bucket falls below the fraction. Unlike df.sample (engine RNG),
    * the SAME rows are kept on every engine and every run — the
    * reproducibility a training-data pipeline needs for ablations.
    * fraction is quantized to 1/256ths.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val buckets = math.round(fraction * 256).toInt
    df.filter(conv(substring(md5(col(keyCol).cast("string")), 1, 2), 16, 10)
      .cast("int") < buckets)
  }
}
