package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents that share word
  * n-gram shingles with a held-out evaluation set (the GPT-3 appendix-C
  * discipline — any training document overlapping an eval benchmark by
  * an n-gram is tainted and must be dropped or audited before training).
  *
  * Shingles are the codegen'd [[graft.functions.HashedShingles]] longs,
  * not string n-grams — the interpreted higher-order-function form cost
  * ~10s/pass at sf0.1 (the exact hot-path pitfall HashedShingles exists
  * for), and overlap COUNTS on well-mixed 64-bit hashes equal counts on
  * strings (collision odds ~n²/2^64 — the same argument the whole
  * Jaccard/MinHash family rests on, so the string-shingle SQL oracle
  * still hash-matches).
  *
  * Scale posture: the benchmark side is eval suites — megabytes against
  * a 100 TB corpus — so its distinct shingle set is collected small and
  * BROADCAST; the corpus side is a single scan → shingle explode →
  * broadcast-hash semi-match → partial count aggregation. No shuffle of
  * corpus text; the wide exchanges are the per-doc count combine
  * (map-side combinable) and the keyed left join that restores
  * zero-count docs. Pinned in PlanSpec: the benchmark-vocabulary match
  * is a BroadcastHashJoin and nothing in the plan is a cartesian.
  */
object Decontaminate {

  /** Per-corpus-document overlap counts against the benchmark docs'
    * distinct shingle set. `isBenchmark` partitions the input: benchmark
    * rows define the tainted shingle vocabulary and are excluded from
    * the output. Returns (doc_id, n_shared, contaminated) for every
    * non-benchmark document, zero-count rows included — the keep-list
    * consumer needs the clean docs too, not just the hits.
    */
  def overlapWithBenchmark(docs: DataFrame, textCol: String, n: Int,
                           isBenchmark: org.apache.spark.sql.Column): DataFrame = {
    graft.functions.HashedShingles.ensureRegistered(docs.sparkSession)
    val shingled = docs
      .withColumn("_bench", isBenchmark)
      .select(col("doc_id"), col("_bench"),
        explode(graft.functions.HashedShingles(col(textCol), n)).as("sh"))
    val benchShingles = shingled.filter(col("_bench")).select("sh").distinct()
    val hits = shingled.filter(!col("_bench"))
      .join(broadcast(benchShingles), Seq("sh"))
      // wordShingles is per-doc distinct already, so count(*) IS the
      // distinct shared-shingle count — no countDistinct shuffle needed.
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.filter(!isBenchmark).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))
  }
}
