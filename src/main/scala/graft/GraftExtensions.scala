package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContainLong, FloatVecDot, FloatVecL2Sq, HashedShinglesExpr, LangIdExpr, SimHash64Expr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions at session build time, so a SQL-only user gets
  * `graft_l2sq`/`graft_dot`/`graft_shingles`/`graft_simhash64`/
  * `graft_lang_id` without touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  *   .getOrCreate()
  * spark.sql("SELECT graft_l2sq(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * (The Scala operators also self-register through
  * `VectorExpressions.ensureRegistered` etc., so extensions are a
  * convenience, not a requirement.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.VectorDistanceRules)
    // session-bound: the ANN registry ownership check compares against
    // THIS session, not the thread-local active one (absent on planner
    // thread pools / streaming foreachBatch)
    e.injectOptimizerRule(s => new graft.plans.AnnIndexRewriteRule(s))
    e.injectOptimizerRule(s => new graft.plans.AggRewriteRule(s))
    e.injectOptimizerRule(s => new graft.plans.ConstraintRewriteRule(s))
    e.injectFunction((FunctionIdentifier("graft_l2sq"),
      info("graft_l2sq", "squared L2 distance between two float arrays"),
      (exprs: Seq[Expression]) => FloatVecL2Sq(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "dot product of two float arrays"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_l2sq_d"),
      info("graft_l2sq_d", "squared L2 distance between two double arrays"),
      (exprs: Seq[Expression]) => graft.functions.DoubleVecL2Sq(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_dot_d"),
      info("graft_dot_d", "dot product of two double arrays"),
      (exprs: Seq[Expression]) => graft.functions.DoubleVecDot(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "distinct hashed word n-gram shingles of text"),
      (exprs: Seq[Expression]) => HashedShinglesExpr(exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue())))
    e.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "64-bit simhash of whitespace tokens"),
      (exprs: Seq[Expression]) => SimHash64Expr(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_lang_id"),
      info("graft_lang_id", "stopword-profile language id"),
      (exprs: Seq[Expression]) => LangIdExpr(exprs(0))))
    e.injectFunction((FunctionIdentifier("graft_bloom_contains"),
      info("graft_bloom_contains",
        "bloom-filter might-contain probe over serialized sketch bytes"),
      (exprs: Seq[Expression]) => BloomMightContainLong(exprs(0), exprs(1))))
  }
}
