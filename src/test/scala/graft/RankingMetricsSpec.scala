package graft

import org.apache.spark.sql.functions._

import graft.eval.RankingMetrics

class RankingMetricsSpec extends GraftSpec {
  import spark.implicits._

  private def ranking(qid: Long, ids: Seq[Long]) =
    ids.zipWithIndex.map { case (id, i) => (qid, id, i + 1L) }

  test("mrr / precision / ndcg match hand-computed values") {
    val gt = ranking(1L, Seq(10, 20, 30)).toDF("qid", "vec_id", "rk")
    val ret = ranking(1L, Seq(20, 99, 10)).toDF("qid", "vec_id", "rk")
    val r = RankingMetrics.evaluate(gt, ret, 3).collect().head
    val disc = RankingMetrics.discounts(3).map(_._2)
    assert(r.getAs[Long]("n_rel") === 3L)
    assert(r.getAs[Double]("mrr") === 1.0) // first retrieved is relevant
    assert(r.getAs[Double]("precision_3") === math.rint(2.0 / 3 * 1e4) / 1e4)
    val dcg = disc(0) + disc(2) // hits at ranks 1 and 3
    val idcg = disc.sum
    assert(r.getAs[Double]("ndcg_3") === math.rint(dcg / idcg * 1e4) / 1e4)
  }

  test("perfect ranking scores 1.0 everywhere; disjoint ranking scores 0.0") {
    val gt = ranking(1L, Seq(1, 2, 3)).toDF("qid", "vec_id", "rk")
    val perfect = RankingMetrics.evaluate(gt, gt, 3).collect().head
    assert(perfect.getAs[Double]("mrr") === 1.0)
    assert(perfect.getAs[Double]("precision_3") === 1.0)
    assert(perfect.getAs[Double]("ndcg_3") === 1.0)

    val miss = ranking(1L, Seq(7, 8, 9)).toDF("qid", "vec_id", "rk")
    val zero = RankingMetrics.evaluate(gt, miss, 3).collect().head
    assert(zero.getAs[Double]("mrr") === 0.0)
    assert(zero.getAs[Double]("precision_3") === 0.0)
    assert(zero.getAs[Double]("ndcg_3") === 0.0)
  }

  test("late first hit discounts mrr and ndcg but recall@k would not see it") {
    val gt = ranking(1L, Seq(1, 2, 3)).toDF("qid", "vec_id", "rk")
    // same set retrieved, reversed order: recall@3 = 1.0 either way
    val rev = ranking(1L, Seq(3, 2, 1)).toDF("qid", "vec_id", "rk")
    val r = RankingMetrics.evaluate(gt, rev, 3).collect().head
    assert(r.getAs[Double]("mrr") === 1.0) // rank 1 is still relevant
    assert(r.getAs[Double]("precision_3") === 1.0)
    assert(r.getAs[Double]("ndcg_3") === 1.0) // binary relevance: set-equal

    // a genuinely late hit: only one relevant id, at rank 3
    val late = ranking(1L, Seq(8, 9, 1)).toDF("qid", "vec_id", "rk")
    val l = RankingMetrics.evaluate(gt, late, 3).collect().head
    assert(l.getAs[Double]("mrr") === math.rint(1.0 / 3 * 1e4) / 1e4)
    val disc = RankingMetrics.discounts(3).map(_._2)
    assert(l.getAs[Double]("ndcg_3") === math.rint(disc(2) / disc.sum * 1e4) / 1e4)
  }

  test("discount tables and their sql twins carry identical doubles") {
    val d = RankingMetrics.discounts(10)
    assert(d.head === ((1, 1.0)))
    assert(d.forall { case (i, v) => v <= 1.0 && v > 0.0 && i >= 1 })
    // monotone decreasing discounts; ideal DCG strictly increasing
    assert(d.map(_._2) === d.map(_._2).sorted.reverse)
    val ideal = RankingMetrics.idealDcg(10)
    assert(ideal.map(_._2) === ideal.map(_._2).sorted)
    // the SQL literals round-trip to the same doubles
    val parsed = RankingMetrics.discountsSql(10).split("\\), \\(").map(
      _.replaceAll("[()]", "").split(", ")(1).toDouble)
    assert(parsed.toSeq === d.map(_._2))
  }
}
