package graft.tools

/** Dump formatted physical plans for selected queries (plan-inspection
  * harness; not part of the driver contract). Uses the production
  * session factory (GraftSession: extensions, AQE posture, shuffle
  * partitions) so dumped plans match what Verify/Bench execute, and
  * registers the custom expression families some queries require.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(8)
    val names = if (args.nonEmpty) args.toSeq else Seq("knn_exact_multi", "q3_top_orders")
    val spark = graft.GraftSession.builder("graft-explain", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.ensureRegistered(spark)
    graft.functions.HashedShingles.ensureRegistered(spark)
    graft.functions.TextExpressions.ensureRegistered(spark)
    names.foreach { n =>
      println(s"========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
