package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions
import graft.model.Tables
import graft.plans.AnnIndexRewrite
import graft.search.{Hnsw, IvfIndex}

/** Planner-chosen ANN: the distance-orderBy-limit pattern rewrites to a
  * stored-index probe when (and only when) a fitted index is registered
  * for the scanned path — and the rewrite never changes results.
  */
class AnnRewriteSpec extends GraftSpec {
  import spark.implicits._

  private lazy val srcPath = s"$sfDir/embeddings.parquet"

  /** The shared test session may carry a cache() of this very table
    * from another suite (VectorDistanceRulesSpec does), and cache
    * substitution replaces the scan with an InMemoryRelation — which
    * hides the source path and (by documented design) keeps the exact
    * plan. Drop any such cache entry so these tests see the real scan.
    */
  private def emb = {
    val df = Tables.embeddings(spark, sfDir)
    df.unpersist(true)
    df
  }

  private def pattern(qv: Array[Float]): DataFrame =
    emb.select($"vec_id",
        VectorExpressions.l2Sq(typedLit(qv), $"embedding").as("dist2"))
      .orderBy($"dist2", $"vec_id")
      .limit(10)

  private def qv0: Array[Float] =
    emb.filter($"vec_id" === 0).select("embedding").head().getSeq[Float](0).toArray

  private def registerExhaustive(): Unit = {
    val cent = IvfIndex.seedCentroids(emb, 4)
    val idx = Hnsw.buildRoutedIndex(spark, emb, cent).localCheckpoint(true)
    AnnIndexRewrite.register(srcPath,
      AnnIndexRewrite.IndexSpec(idx, cent, nprobe = 4, efSearch = 4096))
  }

  private def semiJoins(df: DataFrame): Seq[Join] =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType == LeftSemi => j
    }

  test("no registered index: the pattern keeps the exact plan (fallback)") {
    VectorExpressions.ensureRegistered(spark)
    AnnIndexRewrite.clear()
    val plan = AnnIndexRewrite(pattern(qv0).queryExecution.optimizedPlan)
    assert(plan.collect { case j: Join => j }.isEmpty,
      "without registration the plan must stay the exact Sort+Limit")
  }

  test("registered index: the rule fires and splices a semi-join probe") {
    VectorExpressions.ensureRegistered(spark)
    registerExhaustive()
    try {
      val before = pattern(qv0).queryExecution.optimizedPlan
      val after = AnnIndexRewrite(before)
      val joins = after.collect { case j: Join if j.joinType == LeftSemi => j }
      assert(joins.size === 1, "exactly one probe semi-join spliced")
      assert(after.toString.contains("MapPartitions"),
        "the probe side carries the per-cell graph walk")
    } finally AnnIndexRewrite.clear()
  }

  test("rewritten plan returns the EXACT top-10 (end-to-end equality)") {
    VectorExpressions.ensureRegistered(spark)
    AnnIndexRewrite.clear()
    val expected = pattern(qv0).collect().map(r => (r.getLong(0), r.getDouble(1)))
    registerExhaustive()
    spark.experimental.extraOptimizations = Seq(AnnIndexRewrite)
    try {
      val df = pattern(qv0)
      assert(semiJoins(df).size === 1, "the optimizer itself applied the rewrite")
      val got = df.collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq === expected.toSeq,
        "index acceleration must not change the exact result")
    } finally {
      spark.experimental.extraOptimizations = Nil
      AnnIndexRewrite.clear()
    }
  }

  test("pushed-projection shape (Limit → Project → Sort) also fires") {
    // The ann_planner_rewrite query wraps the pattern in an outer
    // rounding projection; the optimizer pushes that Project below the
    // Limit, giving Limit → Project → Sort → Project → Scan. The rule
    // must fire on that shape too (it silently fell back to exact on
    // first integration — rows matched, plan didn't).
    VectorExpressions.ensureRegistered(spark)
    registerExhaustive()
    try {
      val before = AnnIndexRewrite.fired.get()
      val df = pattern(qv0)
        .select($"vec_id", round(sqrt($"dist2"), 4).as("dist"))
        .orderBy($"dist", $"vec_id")
      val after = AnnIndexRewrite(df.queryExecution.optimizedPlan)
      assert(after.collect { case j: Join if j.joinType == LeftSemi => j }.size === 1,
        "rewrite must fire through the pushed projection")
      assert(AnnIndexRewrite.fired.get() === before + 1)
    } finally AnnIndexRewrite.clear()
  }

  test("a Filter between the pattern and the scan blocks the rewrite") {
    // Filtered kNN must keep the exact plan: pruning candidates BEFORE
    // the filter would silently lose recall (the classic filtered-ANN
    // pitfall ann_filtered_top10's Scaladoc describes).
    VectorExpressions.ensureRegistered(spark)
    registerExhaustive()
    try {
      val df = emb.filter($"label" === 3)
        .select($"vec_id",
          VectorExpressions.l2Sq(typedLit(qv0), $"embedding").as("dist2"))
        .orderBy($"dist2", $"vec_id")
        .limit(10)
      val after = AnnIndexRewrite(df.queryExecution.optimizedPlan)
      assert(after.collect { case j: Join => j }.isEmpty,
        "a filtered scan must NOT be candidate-pruned")
    } finally AnnIndexRewrite.clear()
  }

  test("rewrite disabled by conf even when an index is registered") {
    VectorExpressions.ensureRegistered(spark)
    registerExhaustive()
    spark.conf.set("spark.graft.ann.rewrite", "false")
    try {
      val after = AnnIndexRewrite(pattern(qv0).queryExecution.optimizedPlan)
      assert(after.collect { case j: Join => j }.isEmpty)
    } finally {
      spark.conf.unset("spark.graft.ann.rewrite")
      AnnIndexRewrite.clear()
    }
  }
  test("two ANN patterns in one query: no exprId collision, both exact") {
    // a union of two kNN results over the same registered table: a
    // DataFrame-backed spec may splice only ONCE per plan (the second
    // pattern keeps the exact path); a path-backed spec splices fresh
    // reads and may fire for both. Either way the RESULT must equal
    // the pure-exact union — and analysis must not blow up on
    // duplicated index attrs, which is what an unguarded second splice
    // did.
    VectorExpressions.ensureRegistered(spark)
    AnnIndexRewrite.clear()
    val qv1 = qv0
    val qv2 = emb.filter($"vec_id" === 1).select("embedding").head().getSeq[Float](0).toArray
    def both: DataFrame = pattern(qv1).unionByName(pattern(qv2))
    val expected = both.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    registerExhaustive() // DataFrame-backed (indexPath = None)
    spark.experimental.extraOptimizations = Seq(AnnIndexRewrite)
    try {
      val got = both.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      assert(got.toSeq === expected.toSeq)
      // path-backed: write the index, register with indexPath, expect
      // BOTH patterns accelerated and the same exact rows
      AnnIndexRewrite.clear()
      val cent = IvfIndex.seedCentroids(emb, 4)
      val tmp = java.nio.file.Files.createTempDirectory("graft_annidx_spec").toString
      Hnsw.buildRoutedIndex(spark, emb, cent)
        .write.mode("overwrite").partitionBy("cell").parquet(tmp)
      AnnIndexRewrite.register(srcPath,
        AnnIndexRewrite.IndexSpec(spark.read.parquet(tmp), cent,
          nprobe = 4, efSearch = 4096, indexPath = Some(tmp)))
      val df2 = both
      assert(semiJoins(df2).size === 2,
        "path-backed spec must accelerate BOTH patterns (fresh reads per splice)")
      val got2 = df2.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
      assert(got2.toSeq === expected.toSeq)
    } finally {
      spark.experimental.extraOptimizations = Nil
      AnnIndexRewrite.clear()
    }
  }

}
