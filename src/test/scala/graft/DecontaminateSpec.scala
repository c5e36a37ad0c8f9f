package graft

import org.apache.spark.sql.functions._

import graft.dedup.Decontaminate

class DecontaminateSpec extends GraftSpec {
  import spark.implicits._

  test("overlap counts distinct shared shingles; benchmark rows are excluded from output") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "bench"),
      (2L, "the quick brown dog sits", "corpus"),   // shares "the quick brown"
      (3L, "completely different words here now", "corpus"),
      (4L, "the quick brown fox jumps", "corpus"))  // exact copy of the benchmark doc
      .toDF("doc_id", "text", "kind")
    val out = Decontaminate
      .overlapWithBenchmark(docs, "text", 3, col("kind") === "bench")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array((2L, 1L, true), (3L, 0L, false), (4L, 3L, true)),
      "doc 2 shares one 3-gram, doc 3 none, doc 4 all three; doc 1 (benchmark) is absent")
  }

  test("docs too short to shingle are clean, not dropped from the report") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "bench"),
      (2L, "two words", "corpus"))
      .toDF("doc_id", "text", "kind")
    val out = Decontaminate
      .overlapWithBenchmark(docs, "text", 3, col("kind") === "bench")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out === Array((2L, 0L, false)))
  }
}
