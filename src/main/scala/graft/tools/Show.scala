package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the rows of selected SparkEntry queries (debug harness; not
  * part of the driver contract). Usage: runMain graft.tools.Show q1 q2
  */
object Show {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ($sfDir) ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).show(100, truncate = false)
    }
    graft.SparkEntry.clearCaches()
    spark.stop()
  }
}
