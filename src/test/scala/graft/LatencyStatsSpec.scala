package graft

import graft.eval.LatencyStats

/** Direct pin of the A2-A7 statistics semantics on known values —
  * especially the reference's deliberate sample-vs-population stddev
  * split (statistics.stdev in the speed experiment, np.std in the
  * recall experiment; BASELINE.md caveats).
  */
class LatencyStatsSpec extends GraftSpec {
  import spark.implicits._

  test("known values: mean/median/sample-vs-population stddev") {
    // values 2, 4, 6: mean 4, median 4, var_samp 4 -> 2.0, var_pop 8/3
    val df = Seq(("g", 2.0), ("g", 4.0), ("g", 6.0)).toDF("grp", "ms")
    val r = LatencyStats.stats(df, Seq("grp"), "ms").head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("mean_v") === 4.0)
    assert(r.getAs[Double]("median_v") === 4.0)
    assert(r.getAs[Double]("std_samp_v") === 2.0)
    assert(r.getAs[Double]("std_pop_v") === 1.633) // sqrt(8/3) rounded to 4
  }

  test("n=1 group: sample stddev is guarded to 0.0 (the reference's n==1 branch)") {
    val df = Seq(("g", 5.0)).toDF("grp", "ms")
    val r = LatencyStats.stats(df, Seq("grp"), "ms").head()
    assert(r.getAs[Double]("std_samp_v") === 0.0)
    assert(r.getAs[Double]("std_pop_v") === 0.0)
  }

  test("grand mean is the mean of per-group means, not the pooled mean") {
    // group a: (1, 3) mean 2; group b: (10) mean 10 -> grand 6; pooled would be 14/3
    val df = Seq(("a", "x", 1.0), ("a", "x", 3.0), ("b", "x", 10.0)).toDF("g", "coll", "ms")
    val r = LatencyStats.grandMean(df, Seq("g"), Seq("coll"), "ms").head()
    assert(r.getAs[Double]("grand_mean") === 6.0)
    assert(r.getAs[Long]("n_groups") === 2L)
  }
}
