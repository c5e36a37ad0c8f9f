package graft

import graft.model.Tables
import graft.textual.UnigramLm

/** Unigram-LM tokenizer training: determinism (the frozen-oracle
  * contract), EM behavior on a hand-checked corpus, segmentation
  * totality, and partition-count invariance of the fixed-point sums.
  */
class UnigramLmSpec extends GraftSpec {
  import spark.implicits._

  test("EM promotes the dominant substring; Viterbi uses it") {
    // 'ab' must out-score the char path [a,b,...] and win Viterbi.
    // (seedMaxLen = 2 keeps whole words out of the vocab — with longer
    // seeds the single piece 'abab' legitimately wins one-piece
    // segmentation, the correct unigram-LM behavior.)
    val docs = Seq.fill(20)("abab ababab").toDF("text")
      .selectExpr("monotonically_increasing_id() AS doc_id", "text")
    val v = UnigramLm.train(spark, docs, "text", vocabSize = 8, seedMaxLen = 2)
    assert(v.pieces.contains("ab"), s"vocab=${v.pieces.keys.toSeq.sorted}")
    assert(UnigramLm.segmentWord("abab", v) === Seq("ab", "ab"))
    assert(UnigramLm.segmentWord("ababab", v) === Seq("ab", "ab", "ab"))
    // chars survive pruning: an unseen-bigram word still segments
    assert(UnigramLm.segmentWord("ba", v).flatten.mkString === "ba")
  }

  test("two fits are bit-identical (the frozen-oracle contract)") {
    val docs = Tables.documents(spark, sfDir)
    val a = UnigramLm.train(spark, docs, "text", vocabSize = 96)
    val b = UnigramLm.train(spark, docs, "text", vocabSize = 96)
    assert(a.pieces === b.pieces)
    assert(a.pieces.size <= 96 + a.pieces.keysIterator.count(_.length == 1))
  }

  test("fixed-point E-step sums are partition-count invariant") {
    val docs = Tables.documents(spark, sfDir)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val v1 = UnigramLm.train(spark, docs.repartition(2), "text", vocabSize = 64)
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      val v2 = UnigramLm.train(spark, docs.repartition(13), "text", vocabSize = 64)
      assert(v1.pieces === v2.pieces,
        "BIGINT micro-unit quantization must make the EM sums partitioning-proof")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("segmentation table: every distinct word round-trips through its pieces") {
    val docs = Tables.documents(spark, sfDir)
    val v = UnigramLm.train(spark, docs, "text", vocabSize = 96)
    val seg = UnigramLm.segmentation(spark, docs, "text", v).collect()
    assert(seg.nonEmpty)
    seg.foreach { r =>
      val word = r.getString(0)
      val pieces = r.getSeq[String](1)
      assert(pieces.mkString === word, s"pieces of '$word' must concatenate back")
      assert(r.getLong(2) === pieces.length.toLong)
      assert(pieces.forall(p => v.pieces.contains(p)),
        s"every emitted piece of '$word' must be in-vocab")
    }
  }

  test("streamed unigram tokenization equals the batch result at any batching") {
    // Viterbi under a FROZEN vocab is per-doc pure ⇒ the union of
    // per-batch stream-static joins equals the batch join however the
    // docs were shattered — the BPE twin's contract, now symmetric
    // across both tokenizer families.
    val docs = Tables.documents(spark, sfDir).limit(120)
      .localCheckpoint(eager = true)
    val v = UnigramLm.train(spark, docs, "text", vocabSize = 64)
    val seg = UnigramLm.segmentation(spark, docs, "text", v)
      .localCheckpoint(eager = true)
    val batch = UnigramLm.tokenizeStats(docs, "text", "doc_id", seg)
    Seq(2, 3).foreach { nFiles =>
      val streamed = graft.streaming.TokenizeMaintenance
        .maintainUnigramFromBatch(spark, docs, seg, nFiles = nFiles)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
        s"unigram stream != batch at nFiles=$nFiles")
    }
  }
}
