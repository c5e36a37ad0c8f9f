package graft.tools
import org.apache.spark.sql.SparkSession
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("pq-probe", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (_, d) = graft.search.Pq.train(spark, emb, m = 16, w = 4, k = 64, iters = 3)
    println("DISTORTIONS " + d.map(m => m.values.sum).mkString(", "))
    spark.stop()
  }
}
