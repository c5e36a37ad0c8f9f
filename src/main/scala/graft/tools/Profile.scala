package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions._
import graft.model.Tables

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    docs.count()

    t("tokens only") {
      docs.select(size(tokens(col("text"))).as("n")).agg(sum("n")).head().getLong(0)
    }
    t("shingles") {
      docs.select(size(wordShingles(col("text"), 3)).as("n")).agg(sum("n")).head().getLong(0)
    }
    t("hashedSet(shingles)") {
      docs.select(size(hashedSet(wordShingles(col("text"), 3))).as("n")).agg(sum("n")).head().getLong(0)
    }
    val sh = docs.select(col("doc_id").as("id"), hashedSet(wordShingles(col("text"), 3)).as("sh"))
    t("posts explode") {
      sh.select(col("id"), explode(col("sh")).as("s")).count()
    }
    val posts = sh.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("s"))
    t("co-occurrence join+agg") {
      posts.as("x").join(posts.as("y"), col("x.s") === col("y.s") && col("x.id") < col("y.id"))
        .groupBy(col("x.id"), col("y.id")).count().count()
    }
    t("full ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, 3, 0.6).count()
    }
    t("full minHash") {
      Dedup.minHash(docs, 3, 0.6).count()
    }
    // posting-list stats
    val df = posts.groupBy("s").count()
    df.agg(count(lit(1)).as("distinct_shingles"), sum(col("count") * col("count")).as("sum_df2"),
      max("count").as("max_df")).show()
    spark.stop()
  }
}
