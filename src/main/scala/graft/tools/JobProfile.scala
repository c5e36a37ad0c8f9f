package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.{GraftSession, SparkEntry}

/** Scratch per-job profiling main (not part of the driver contract):
  * run one query and print every Spark job it launched with wall time
  * and description — splits a multi-job operator (streaming twins,
  * maintenance cycles) into its billable phases so optimization effort
  * lands on the phase that actually costs (guide §1: measure first).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("REPS", "2").toInt
    val spark = GraftSession.builder("graft-jobprofile", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          lines.add(f"[job] ${je.jobId}%4d ${(je.time - t0) / 1000.0}%7.3fs  $desc")
        }
      }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("events_sessionize_stream")
    names.foreach { n =>
      (1 to reps).foreach { r =>
        lines.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events land asynchronously; drain after a grace period
        Thread.sleep(500)
        println(s"===== $n rep $r wall ${f"$wall%.2f"}s =====")
        lines.forEach(l => println(l))
      }
    }
    spark.stop()
  }
}
