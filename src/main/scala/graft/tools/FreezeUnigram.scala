package graft.tools

import graft.GraftSession
import graft.textual.UnigramLm

/** Freeze the unigram-LM tokenizer's trained vocabulary AND per-word
  * segmentation as Scala source (the FreezeW2v pattern): trains TWICE
  * on the sf0.01 documents, requires bit-identity, prints
  * `graft.UnigramOracle`'s body.
  */
object FreezeUnigram {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("graft-freeze-unigram", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.model.Tables.documents(spark, dir)
    val a = UnigramLm.train(spark, docs, "text", vocabSize = 96)
    val b = UnigramLm.train(spark, docs, "text", vocabSize = 96)
    require(a.pieces == b.pieces, "two fits differ — NOT freezable")
    val seg = UnigramLm.segmentation(spark, docs, "text", a)
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).sortBy(_._1)
    println(s"// ${a.pieces.size} pieces, ${seg.length} distinct words, trained on $dir")
    println("  val vocab: Seq[(String, Long)] = Seq(")
    a.pieces.toSeq.sortBy(_._1).foreach { case (p, s) =>
      println(s"""    ("$p", ${s}L),""")
    }
    println("  )")
    println("  val segmentation: Seq[(String, Seq[String])] = Seq(")
    seg.foreach { case (w, ps) =>
      println(s"""    ("$w", Seq(${ps.map("\"" + _ + "\"").mkString(", ")})),""")
    }
    println("  )")
    spark.stop()
  }
}
