package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.search.{IvfAdc, IvfIndex, KnnExact, Pq}
import graft.eval.RecallAtK

class IvfAdcSpec extends GraftSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()
  private lazy val cent = IvfIndex.seedCentroids(emb, 8).cache()
  private lazy val cbDf = {
    val (cb, _) = Pq.train(spark, emb, m = 16, w = 4, k = 64, iters = 2)
    Pq.codebookDf(spark, cb).cache()
  }
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("qid"), col("embedding").as("qemb")).cache()

  test("indexed search equals one-shot search") {
    val idx = IvfAdc.buildIndex(emb, cent, cbDf, m = 16, w = 4)
    val a = IvfAdc.searchIndex(queries, idx, nprobe = 2, rerank = 50, k = 10)
    val b = IvfAdc.search(queries, emb, cent, cbDf, m = 16, w = 4,
      nprobe = 2, rerank = 50, k = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("recall@10 vs exact is high for in-distribution queries") {
    val gt = KnnExact.topK(queries, emb, 10)
    val approx = IvfAdc.search(queries, emb, cent, cbDf, m = 16, w = 4,
      nprobe = 2, rerank = 50, k = 10)
    val mean = RecallAtK.evaluate(gt, approx, Seq(10))
      .agg(avg(col("recall_10"))).collect().head.getDouble(0)
    assert(mean >= 0.8, s"mean recall@10 = $mean")
  }

  test("plan has no cartesian and exactly one codes scan for 5 queries") {
    val idx = IvfAdc.buildIndex(emb, cent, cbDf, m = 16, w = 4)
    val df = IvfAdc.searchIndex(queries, idx, nprobe = 2, rerank = 50, k = 10)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "IVFADC stages must be broadcast/equi joins, never cartesian")
  }
}
