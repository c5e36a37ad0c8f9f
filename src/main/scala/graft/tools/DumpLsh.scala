package graft.tools

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dump the seeded MLlib BRP-LSH random unit vectors as Scala source
  * (scratch tool): for fixed (seed, dim, numHashTables) the vectors are
  * a pure function of the seed, which lets the DuckDB oracle replicate
  * the MLlib index exactly via frozen literals.
  */
object DumpLsh {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-dump-lsh", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("__vec", array_to_vector(col("embedding")))
    val model = new BucketedRandomProjectionLSH()
      .setInputCol("__vec").setOutputCol("__hashes")
      .setNumHashTables(8).setBucketLength(2.0).setSeed(42L)
      .fit(emb)
    // private[ml] in Scala is public in bytecode — reflection reads it
    val vecs = model.getClass.getMethod("randUnitVectors").invoke(model)
      .asInstanceOf[Array[org.apache.spark.ml.linalg.Vector]]
    println("  private val mllibLshUnitVectors: Array[Array[Double]] = Array(")
    vecs.foreach { v =>
      println("    Array(" + v.toArray.map(d => f"$d%.17e").mkString(", ") + "),")
    }
    println("  )")
    spark.stop()
  }
}
