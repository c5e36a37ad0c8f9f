package graft.tools

import graft.GraftSession
import graft.embed.W2vEmbedder

/** Freeze the seeded Word2Vec vectors as Scala source (the DumpLsh /
  * MllibLshOracle pattern): trains TWICE on the sf0.01 documents and
  * verifies the two runs are bit-identical before printing — if the
  * seeded training stream is not reproducible, this tool fails instead
  * of freezing garbage. Output is pasted into `graft.W2vOracle`.
  */
object FreezeW2v {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-freeze-w2v", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables.documents(spark, dir)
    def train(): Seq[(String, Seq[Double])] =
      W2vEmbedder.fit(docs).vectors
        .collect().map(r => (r.getString(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    val a = train()
    val b = train()
    require(a == b, "two seeded fits differ — vectors are NOT freezable")
    println(s"// ${a.size} words × ${a.head._2.size} dims, trained on $dir")
    println("  val vectors: Array[(String, Array[Double])] = Array(")
    a.foreach { case (w, v) =>
      println(s"""    ("$w", Array(${v.map(d => f"$d%.17e").mkString(", ")})),""")
    }
    println("  )")
    spark.stop()
  }
}
