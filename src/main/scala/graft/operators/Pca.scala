package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic distributed PCA by power iteration — the projection /
  * whitening step a vector pipeline runs before coarse quantization
  * (IVF cell shapes and PQ subspace splits both improve on
  * variance-aligned axes; Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 §V uses exactly this
  * preprocessing). Public-knowledge method (power iteration with
  * deflation, Golub & Van Loan §7.3); no reference-repo counterpart —
  * this is one of the beyond-the-reference training-pipeline operators.
  *
  * DESIGN FOR SCALE + EXACT REPLAY:
  *
  * 1. The only data-sized pass is the Gram accumulation: one
  *    `mapPartitions` over the vectors accumulating a per-partition
  *    (count, Σq_d, Σq_r·q_c) triple in plain long arrays, then a
  *    `reduce` of the 32 partials — no shuffle of pair rows, no
  *    dim²·n intermediate frame. At 100 TB this is the canonical
  *    one-pass accumulator shape (tree-reduce of dim² longs per
  *    partition); the eigen-solve that follows is O(dim³) DRIVER math
  *    on a 64×64 matrix — parameter-bounded, never data-bounded.
  * 2. Vectors are QUANTIZED to integers first — q = ⌊x·scale + 0.5⌋ —
  *    so every cross-product and sum is exact BIGINT arithmetic:
  *    partition count and reduce order can never perturb the Gram
  *    matrix (integer addition is associative), which is what makes
  *    the DuckDB oracle replay exact. The centered covariance uses the
  *    division-free identity n·Σxy − Σx·Σy (still exact integers; the
  *    final CAST to double is IEEE round-to-nearest, identical in both
  *    engines). int64 headroom: |q| ≤ scale·|x|ₘₐₓ, and
  *    n·Σq² ≤ n²·(scale·|x|ₘₐₓ)² must stay < 2⁶³ — at scale 10⁴ and
  *    |x| ≤ 1 that holds to n ≈ 3·10⁵; a 100 TB corpus raises the
  *    accumulator to DECIMAL(38) or drops `scale`, documented here
  *    rather than silently wrong.
  * 3. The power iterations themselves are FIXED-COUNT (no
  *    convergence test — a data-dependent stopping rule would break
  *    replay), start from the constant vector 1/√dim (exactly 0.125
  *    for dim 64 — representable, so both engines start from the same
  *    bits), and every double op (matvec fold, norm, divide,
  *    deflation) is written in the index order the SQL twin uses, so
  *    the trajectory is bit-identical across engines — the frozen-
  *    trajectory discipline of Coreset.kcenter/greedi applied to an
  *    eigen-solver.
  */
object Pca {

  /** One-pass exact integer Gram statistics: (n, Σq_d per dim,
    * row-major Σq_r·q_c with the full symmetric matrix materialized).
    */
  def gramStats(emb: DataFrame, embCol: String, dim: Int, scale: Long)
      : (Long, Array[Long], Array[Long]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ds = emb.select(col(embCol)).as[Array[Float]]
    val (n, sums, upper) = ds.mapPartitions { it =>
      var cnt = 0L
      val s = new Array[Long](dim)
      val p = new Array[Long](dim * dim) // upper triangle accumulated
      val q = new Array[Long](dim)
      it.foreach { v =>
        require(v.length == dim, s"expected $dim-dim vector, got ${v.length}")
        var d = 0
        while (d < dim) {
          q(d) = math.floor(v(d).toDouble * scale + 0.5).toLong
          s(d) += q(d)
          d += 1
        }
        var r = 0
        while (r < dim) {
          var c = r
          while (c < dim) { p(r * dim + c) += q(r) * q(c); c += 1 }
          r += 1
        }
        cnt += 1
      }
      Iterator.single((cnt, s, p))
    }.reduce { (a, b) =>
      val s = Array.tabulate(dim)(i => a._2(i) + b._2(i))
      val p = Array.tabulate(dim * dim)(i => a._3(i) + b._3(i))
      (a._1 + b._1, s, p)
    }
    // mirror the lower triangle so callers index freely
    var r = 0
    while (r < dim) {
      var c = 0
      while (c < r) { upper(r * dim + c) = upper(c * dim + r); c += 1 }
      r += 1
    }
    (n, sums, upper)
  }

  /** Centered scatter matrix n·Σxy − Σx·Σy as doubles (exact integer
    * difference, then one deterministic IEEE cast — proportional to
    * the covariance, which is all an eigen-direction needs).
    */
  def centeredCov(n: Long, sums: Array[Long], prods: Array[Long], dim: Int)
      : Array[Array[Double]] =
    Array.tabulate(dim, dim)((r, c) =>
      (n * prods(r * dim + c) - sums(r) * sums(c)).toDouble)

  private def matvec(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val dim = v.length
    Array.tabulate(dim) { r =>
      var a = 0.0
      var c = 0
      while (c < dim) { a += m(r)(c) * v(c); c += 1 } // index-order fold
      a
    }
  }

  private def norm(w: Array[Double]): Double = {
    var a = 0.0
    var i = 0
    while (i < w.length) { a += w(i) * w(i); i += 1 }
    math.sqrt(a)
  }

  /** Fixed-count power iteration from the constant 1/√dim start
    * vector; returns (unit eigenvector, Rayleigh quotient vᵀMv).
    */
  def dominant(m: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    val dim = m.length
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var k = 0
    while (k < iters) {
      val w = matvec(m, v)
      val nw = norm(w)
      v = Array.tabulate(dim)(i => w(i) / nw)
      k += 1
    }
    val gv = matvec(m, v)
    var lam = 0.0
    var r = 0
    while (r < dim) { lam += v(r) * gv(r); r += 1 }
    (v, lam)
  }

  /** Top-two components via one Hotelling deflation
    * (M₂ = M − λ₁·v₁v₁ᵀ, elementwise `m − λ·v_r·v_c` left-assoc — the
    * SQL twin's operand order) followed by a FINAL Gram–Schmidt
    * re-orthogonalization of v₂ against v₁. The fixed-count trajectory
    * does not converge fully on a near-flat spectrum (isotropic
    * fixtures), so deflation alone leaves a residual v₁-component in
    * v₂; the explicit orthogonalization step makes v₁ ⊥ v₂ BY
    * CONSTRUCTION (machine precision) while staying a deterministic,
    * SQL-replayable vector op. λ₂ is the Rayleigh quotient of the
    * ORIGINAL matrix at the re-orthogonalized v₂. Note: λ₁ ≥ λ₂ is an
    * ASYMPTOTIC property — on a near-flat spectrum (isotropic data)
    * the fixed-count quotients can invert by a few percent; the
    * contract is the deterministic trajectory, not converged
    * eigenpairs.
    */
  def topTwo(m: Array[Array[Double]], iters: Int)
      : (Array[Double], Double, Array[Double], Double) = {
    val (v1, l1) = dominant(m, iters)
    val dim = m.length
    val d = Array.tabulate(dim, dim)((r, c) => m(r)(c) - l1 * v1(r) * v1(c))
    val (u2, _) = dominant(d, iters)
    var proj = 0.0
    var r = 0
    while (r < dim) { proj += v1(r) * u2(r); r += 1 } // index-order fold
    val w = Array.tabulate(dim)(i => u2(i) - proj * v1(i))
    val nw = norm(w)
    val v2 = Array.tabulate(dim)(i => w(i) / nw)
    val gv2 = matvec(m, v2)
    var l2 = 0.0
    r = 0
    while (r < dim) { l2 += v2(r) * gv2(r); r += 1 }
    (v1, l1, v2, l2)
  }

  /** Trace in index order (the explained-variance denominator). */
  def trace(m: Array[Array[Double]]): Double = {
    var a = 0.0
    var r = 0
    while (r < m.length) { a += m(r)(r); r += 1 }
    a
  }
}
