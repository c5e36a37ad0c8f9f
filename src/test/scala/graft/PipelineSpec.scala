package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.model.Tables
import graft.operators.ApproxOps
import graft.textual.TextAnalysis

/** The training-data pipeline end to end — the north-star composition:
  * clean → language filter → quality filter → exact dedup → near-dup
  * removal → deterministic sample → token statistics. Asserts the
  * funnel laws (each stage only narrows), determinism across runs, and
  * that the final corpus carries no surviving near-duplicates.
  */
class PipelineSpec extends GraftSpec {
  import spark.implicits._

  test("clean -> filter -> dedup -> sample -> stats funnel") {
    graft.functions.TextExpressions.ensureRegistered(spark)
    val docs = Tables.documents(spark, sfDir).cache()
    val n0 = docs.count()

    // stage 1: language ID + quality features
    val scored = TextAnalysis.qualityFeatures(
      docs.withColumn("lang_pred", TextAnalysis.langId($"text")), "text")
    val kept = scored
      .filter($"lang_pred" =!= "und" && $"quality_score" >= 0.3 && $"n_tokens" >= 10)
      .cache()
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // stage 2: exact dedup keeps the lowest doc_id per normalized text
    val exactKept = Dedup.exact(kept, "doc_id", "text").select($"kept_id".as("doc_id"))
    val n2 = exactKept.count()
    assert(n2 > 0 && n2 <= n1)

    // stage 3: near-dup removal — drop the higher id of every minhash pair
    val pairs = Dedup.minHash(kept, 3, 0.6, idCol = "doc_id", textCol = "text")
    val dropIds = pairs.select($"id_b".as("doc_id")).distinct()
    val survivors = exactKept.join(dropIds, Seq("doc_id"), "left_anti").cache()
    val n3 = survivors.count()
    assert(n3 > 0 && n3 <= n2)
    // no surviving near-dup pair: both ends of every pair can't remain
    val surviving = pairs
      .join(survivors.select($"doc_id".as("id_a")), Seq("id_a"))
      .join(survivors.select($"doc_id".as("id_b")), Seq("id_b"))
    assert(surviving.count() === 0)

    // stage 4: deterministic sample of the survivors
    val corpus = kept.join(survivors, Seq("doc_id"))
    val sampled = ApproxOps.hashSample(corpus, "doc_id", 0.5).cache()
    val n4 = sampled.count()
    assert(n4 <= n3)

    // stage 5: corpus statistics on the final sample
    val stats = TextAnalysis.tokenCounts(sampled, "text")
      .agg(sum($"n_ws_tokens").as("tokens"), count(lit(1)).as("docs"))
      .head()
    assert(stats.getLong(0) > 0 && stats.getLong(1) === n4)

    // determinism: the whole funnel reproduces exactly
    val again = ApproxOps.hashSample(
      kept.join(exactKept.join(dropIds, Seq("doc_id"), "left_anti"), Seq("doc_id")),
      "doc_id", 0.5)
    assert(again.select("doc_id").except(sampled.select("doc_id")).count() === 0)
    assert(sampled.select("doc_id").except(again.select("doc_id")).count() === 0)
  }
}
