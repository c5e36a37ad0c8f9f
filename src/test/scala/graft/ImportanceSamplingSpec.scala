package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.textual.ImportanceSampling

class ImportanceSamplingSpec extends GraftSpec {
  import spark.implicits._

  test("log-ratio weights match a hand computation") {
    // d1 (target) = "x x y", d2 (raw) = "z z y"
    // ct: x=2 y=1 z=0; cr: x=0 y=1 z=2; nt=3 nr=3 v=3
    // lr(x)=ln(3*6/(1*6))=ln3, lr(y)=ln(2*6/(2*6))=0, lr(z)=ln(1*6/(3*6))=-ln3
    val docs = Seq((1L, "x x y", true), (2L, "z z y", false))
      .toDF("doc_id", "text", "t")
    val w = ImportanceSampling.logRatioWeights(docs, $"t")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ln3 = math.log(3.0)
    assert(math.abs(w(1L) - 2 * ln3 / 3) < 1e-12)
    assert(math.abs(w(2L) - (-2 * ln3 / 3)) < 1e-12)
  }

  test("target-slice documents score higher than raw on the fixture") {
    val w = ImportanceSampling.logRatioWeights(
      Tables.documents(spark, sfDir), $"lang" === "en")
    val means = w.groupBy($"is_target")
      .agg(avg($"logratio_per_token").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"target mean ${means(true)} should exceed raw mean ${means(false)}")
    // the synthetic corpus draws most words from a shared vocabulary,
    // so the separation is small (~0.004 at sf0.001) but consistently
    // positive — the en-only stopword mass is what the LM ratio finds
    assert(means(true) - means(false) > 0.001)
  }

  test("gumbel top-k selects n docs, biased toward high weights, as a heap take") {
    val w = ImportanceSampling.logRatioWeights(
      Tables.documents(spark, sfDir), $"lang" === "en")
    val sel = ImportanceSampling.gumbelTopK(w, 100)
    val rows = sel.collect()
    assert(rows.length === 100)
    assert(rows.map(_.getLong(0)).distinct.length === 100)

    // exp-weight bias: the selected set's mean weight exceeds the
    // population mean (weights differ by fractions of a nat, so the
    // bias is small but must be positive in expectation; the fixed
    // hash coin makes this deterministic, not flaky)
    val selMean = rows.map(_.getDouble(3)).sum / rows.length
    val popMean = w.agg(avg($"logratio_per_token")).collect().head.getDouble(0)
    assert(selMean > popMean,
      s"selected mean $selMean should exceed population mean $popMean")

    // determinism: two runs select the identical set
    val again = ImportanceSampling.gumbelTopK(w, 100).collect().map(_.getLong(0)).toSet
    assert(again === rows.map(_.getLong(0)).toSet)

    // scale posture: top-k is a TakeOrdered, never a global Sort+Limit
    val plan = sel.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("every document with tokens gets exactly one weight row") {
    val docs = Tables.documents(spark, sfDir)
    val nonEmpty = docs.filter(length(trim($"text")) > 0).count()
    val w = ImportanceSampling.logRatioWeights(docs, $"lang" === "en")
    assert(w.count() === nonEmpty)
    assert(w.select($"doc_id").distinct().count() === nonEmpty)
  }
}
