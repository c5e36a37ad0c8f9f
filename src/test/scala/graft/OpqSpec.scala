package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.search.{Opq, Pq}

/** Parametric OPQ: the variance-balanced dimension allocation and its
  * composition with the fixed-point PQ trainer.
  */
class OpqSpec extends GraftSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val alloc = Opq.varianceAllocation(emb, "embedding", 64, 16)

  test("allocation: card-dealing balance, bijective permutation, partition-invariant") {
    val (varfp, perm) = alloc
    assert(perm.toSet === (0 until 64).toSet, "permutation is a bijection over dims")
    // card-dealing: rank rn lands at block rn % m, slot rn / m
    val ranked = (0 until 64).sortBy(d => (-varfp(d), d))
    for (rn <- 0 until 64) {
      val (b, s) = (rn % 16, rn / 16)
      assert(perm(b * 4 + s) === ranked(rn),
        s"rank $rn must deal to block $b slot $s")
    }
    // each block receives exactly one dim per variance tier, so block
    // variance totals are balanced: every block's total sits between
    // the sums of the per-tier minima and maxima
    val byBlock = (0 until 16).map(b =>
      (0 until 4).map(s => varfp(perm(b * 4 + s))).sum)
    val tiers = ranked.grouped(16).toSeq
    val lo = tiers.map(t => t.map(varfp).min).sum
    val hi = tiers.map(t => t.map(varfp).max).sum
    assert(byBlock.forall(v => v >= lo && v <= hi),
      "dealt blocks stay within the per-tier min/max envelope")
    // the Gram pass is exact-integer: partition layout cannot change it
    val (v2, p2) = Opq.varianceAllocation(emb.repartition(7), "embedding", 64, 16)
    assert(varfp.toSeq === v2.toSeq && perm.toSeq === p2.toSeq)
  }

  test("permuted column holds exactly the source values in dealt order") {
    val (_, perm) = alloc
    val row = emb.orderBy("vec_id")
      .select(col("embedding"), Opq.permuted("embedding", perm).as("p"))
      .head()
    val e = row.getSeq[Float](0)
    val p = row.getSeq[Float](1)
    assert(p.toSeq === perm.toSeq.map(e(_)), "out[pos] == in[perm(pos)]")
  }

  test("OPQ ADC candidates contain the exact top-10 (same contract as PQ)") {
    val got = SparkEntry.queries("ann_opq_top10")(spark, sfDir)
      .collect().map(_.getLong(0)).toSeq
    val exact = SparkEntry.queries("knn_exact_top10")(spark, sfDir)
      .filter(col("qid") === 0).orderBy("rk")
      .collect().map(r => r.getLong(1)).toSeq
    assert(got === exact,
      "ADC top-50 over the permuted codes must contain (and re-rank to) the exact top-10")
  }

  test("permutation preserves L2: training distortion is finite and decreases") {
    val (_, perm) = alloc
    val pemb = emb.select(col("vec_id"),
      Opq.permuted("embedding", perm).as("embedding"))
    val (_, dists) = Pq.train(spark, pemb, m = 16, w = 4, k = 64, iters = 2)
    val totals = dists.map(_.values.sum)
    assert(totals.length === 3)
    assert(totals.sliding(2).forall { case Seq(a, b) => b <= a },
      "Lloyd distortion is monotone non-increasing on the permuted frame")
  }
}
