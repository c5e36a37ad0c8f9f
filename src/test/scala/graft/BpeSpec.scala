package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.textual.Bpe

/** BPE training/tokenization against an independent driver-side
  * reference implementation (lists of symbols, no string encoding) —
  * the same differential discipline ClustersSpec uses: the distributed
  * operator and a trivially-auditable local algorithm must agree
  * merge-for-merge.
  */
class BpeSpec extends GraftSpec {

  import spark.implicits._

  /** Plain local BPE with the operator's exact contract: pair counts
    * weighted by word frequency (overlapping adjacencies all count),
    * argmax by (count desc, left asc, right asc), merges applied
    * left-to-right with scan-continue (a merged pair's right symbol
    * cannot start the next match).
    */
  private def referenceBpe(words: Map[String, Long], nMerges: Int)
      : (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    var syms: Map[String, Seq[String]] =
      words.keys.map(w => w -> w.map(_.toString)).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    (1 to nMerges).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, f) =>
        syms(w).sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((a, b, c))
        syms = syms.map { case (w, s) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              out += a + b; i += 2 // scan continues AFTER the merge
            } else { out += s(i); i += 1 }
          }
          w -> out.toSeq
        }
      }
    }
    (merges.toSeq, syms)
  }

  test("learned merges match the local reference merge-for-merge") {
    val text = Seq(
      "low low low lower lower newest newest",
      "newest newest widest wide wider new news",
      "lowest lowest newest widest low new")
    val docs = text.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val words = text.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val (expMerges, expSyms) = referenceBpe(words, 6)
    val (gotMerges, finalWords) = Bpe.trainMerges(spark, docs, "text", 6)
    assert(gotMerges.map(m => (m.lhs, m.rhs, m.pairCount)) === expMerges)
    // and the final symbol segmentation agrees word-for-word
    val gotSyms = finalWords
      .select(col("word"), split(col("enc"), Bpe.SymStart).as("raw"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[String](1).filter(_.nonEmpty).map(_.stripSuffix(Bpe.SymEnd)))
      .toMap
    assert(gotSyms === expSyms)
  }

  test("runs merge pairwise left-to-right: aaaa -> [aa][aa], count 3") {
    // overlapping adjacencies all COUNT (3 pairs in aaaa) but the merge
    // scan resumes after each replacement, so the word segments into
    // exactly two 'aa' symbols — canonical BPE run behavior
    val docs = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val (merges, words) = Bpe.trainMerges(spark, docs, "text", 1)
    assert(merges === Seq(Bpe.Merge(1, "a", "a", 3L)))
    val enc = words.select("enc").head().getString(0)
    assert(enc === s"${Bpe.SymStart}aa${Bpe.SymEnd}${Bpe.SymStart}aa${Bpe.SymEnd}")
  }

  test("prefix symbols never false-match: merging (a,b) leaves ab-the-symbol alone") {
    // after merge 1 the symbol 'ab' exists; a later merge of (a, b)
    // must not fire INSIDE words where 'ab' is already one symbol
    val docs = Seq((0L, "ab ab ab xa by")).toDF("doc_id", "text")
    val (merges, words) = Bpe.trainMerges(spark, docs, "text", 1)
    assert(merges.head === Bpe.Merge(1, "a", "b", 3L))
    val segs = words.filter(col("word") === "xa")
      .select("enc").head().getString(0)
    assert(segs.contains(s"${Bpe.SymStart}x${Bpe.SymEnd}"),
      "untouched words keep their single-char symbols")
  }

  test("tokenizeStats: counts join back per doc, empty docs keep a zero row") {
    val docs = Seq((0L, "low lower"), (1L, ""), (2L, "newest")).toDF("doc_id", "text")
    val (_, words) = Bpe.trainMerges(spark, docs, "text", 2)
    val stats = Bpe.tokenizeStats(docs, "text", "doc_id", words)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.map(_._1) === Array(0L, 1L, 2L))
    assert(stats(1) === ((1L, 0L, 0L)), "an empty doc keeps a (0, 0) row")
    assert(stats(0)._2 === 2L && stats(2)._2 === 1L)
    // subtokens strictly decrease from char count as merges apply
    assert(stats(0)._3 < "lowlower".length && stats(0)._3 >= 2L)
  }

  test("property: random corpora agree with the local reference merge-for-merge") {
    // seeded random corpora over a tiny alphabet (repetition-heavy, so
    // merges chain and ties occur) — the distributed trainer must match
    // the reference on every one, including the tie-break rule
    val rng = new scala.util.Random(20260814L)
    (0 until 4).foreach { trial =>
      val vocabChars = "abcde".take(3 + trial % 3)
      def word(): String =
        (0 until 1 + rng.nextInt(5)).map(_ => vocabChars(rng.nextInt(vocabChars.length))).mkString
      val docs = (0 until 6).map { d =>
        (d.toLong, (0 until 5 + rng.nextInt(20)).map(_ => word()).mkString(" "))
      }.toDF("doc_id", "text")
      val words = docs.collect().flatMap(_.getString(1).split(" "))
        .groupBy(identity).map { case (w, g) => w -> g.length.toLong }
      val (expMerges, _) = referenceBpe(words, 5)
      val gotMerges = Bpe.trainMerges(spark, docs, "text", 5)._1
      assert(gotMerges.map(m => (m.lhs, m.rhs, m.pairCount)) === expMerges,
        s"trial $trial diverged (alphabet $vocabChars)")
    }
  }

  test("streamed tokenization equals the batch result at any batching") {
    // per-doc purity ⇒ the union of per-batch stream-static joins
    // equals the batch join, however docs were shattered into files
    val docs = Tables.documents(spark, sfDir).limit(120)
      .localCheckpoint(eager = true)
    val (_, vocab) = Bpe.trainMerges(spark, docs, "text", 3)
    val batch = Bpe.tokenizeStats(docs, "text", "doc_id", vocab)
    Seq(2, 3).foreach { nFiles =>
      val streamed = graft.streaming.TokenizeMaintenance
        .maintainFromBatch(spark, docs, vocab, nFiles = nFiles)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        s"stream != batch at nFiles=$nFiles")
    }
  }

  test("deterministic: two trainings agree exactly") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val a = Bpe.trainMerges(spark, docs, "text", 4)._1
    val b = Bpe.trainMerges(spark, docs, "text", 4)._1
    assert(a === b)
  }
}
