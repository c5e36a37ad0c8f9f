package graft.tools

/** Time one declared query by name: `runMain graft.tools.TimeQuery
  * <query> [reps]` against SPARK_GRAFT_SF_DIR. Prints per-run wall
  * seconds (run 1 is the warm-up — JIT + codegen + page cache) through
  * the same noop sink the bench uses, so numbers are comparable to
  * BENCH_DETAIL's serial sidecar. The micro-profiling loop behind
  * plan-cost decisions like the qualityFeatures tokenize-once boundary.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = graft.GraftSession.builder("graft-timequery", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timequery] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    graft.SparkEntry.clearCaches()
    spark.stop()
  }
}
