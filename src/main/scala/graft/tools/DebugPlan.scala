package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").appName("dbg")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val q = li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), max(col("l_quantity")).as("max_qty"))
    println(q.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
