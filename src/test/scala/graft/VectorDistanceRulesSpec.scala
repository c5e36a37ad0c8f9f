package graft

import org.apache.spark.sql.catalyst.expressions.{If, LessThanOrEqual, Literal, Sqrt}
import org.apache.spark.sql.functions._

import graft.functions.{FloatVecL2Sq, VectorExpressions}
import graft.model.Tables
import graft.plans.VectorDistanceRules

class VectorDistanceRulesSpec extends GraftSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()

  test("radius predicate loses the sqrt after the rule") {
    VectorExpressions.ensureRegistered(spark)
    val df = emb.filter(sqrt(VectorExpressions.l2Sq($"embedding", $"embedding")) <= lit(2.0))
    val analyzed = df.queryExecution.analyzed
    val before = analyzed.expressions.flatMap(_.collect { case s: Sqrt => s })
    assert(before.nonEmpty, "sanity: analyzed plan contains the sqrt")
    val after = VectorDistanceRules(analyzed)
    assert(after.expressions.flatMap(_.collect { case s: Sqrt => s }).isEmpty,
      "rule must eliminate sqrt from the radius predicate")
  }

  test("strength-reduced predicate selects the same rows") {
    VectorExpressions.ensureRegistered(spark)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".as("qemb")).head().getSeq[Float](0).toArray
    val viaSqrt = emb
      .filter(sqrt(VectorExpressions.l2Sq(lit(q), $"embedding")) <= lit(3.5))
      .select($"vec_id")
    val viaSquared = emb
      .filter(VectorExpressions.l2Sq(lit(q), $"embedding") <= lit(3.5 * 3.5))
      .select($"vec_id")
    assert(viaSqrt.except(viaSquared).count() === 0)
    assert(viaSquared.except(viaSqrt).count() === 0)
  }

  test("self-distance folds to a null-preserving zero") {
    VectorExpressions.ensureRegistered(spark)
    val df = emb.select(VectorExpressions.l2Sq($"embedding", $"embedding").as("d"))
    val after = VectorDistanceRules(df.queryExecution.analyzed)
    val folded = after.expressions.flatMap(_.collect {
      case If(_, Literal(null, _), Literal(0.0, _)) => true
    })
    assert(folded.nonEmpty, "l2sq(a, a) must fold to If(isnull, null, 0.0)")
    val l2sqLeft = after.expressions.flatMap(_.collect { case e: FloatVecL2Sq => e })
    assert(l2sqLeft.isEmpty, "no self-distance computation may survive")
  }

  test("rule leaves distinct-argument distances untouched") {
    VectorExpressions.ensureRegistered(spark)
    val other = emb.select($"vec_id".as("id2"), $"embedding".as("emb2"))
    val df = emb.crossJoin(other.limit(1))
      .select(VectorExpressions.l2Sq($"embedding", $"emb2").as("d"))
    val after = VectorDistanceRules(df.queryExecution.analyzed)
    assert(after.expressions.flatMap(_.collect { case e: FloatVecL2Sq => e }).nonEmpty)
  }

  test("LessThanOrEqual shape sanity (rule rewrites comparison, not semantics)") {
    // pure-expression check: the rewritten literal is r*r
    VectorExpressions.ensureRegistered(spark)
    val df = emb.filter(sqrt(VectorExpressions.l2Sq($"embedding", $"embedding")) <= lit(2.0))
    val after = VectorDistanceRules(df.queryExecution.analyzed)
    val rewritten = after.expressions.flatMap(_.collect {
      case LessThanOrEqual(_, Literal(v: Double, _)) if v == 4.0 => true
    })
    assert(rewritten.nonEmpty)
  }
}
