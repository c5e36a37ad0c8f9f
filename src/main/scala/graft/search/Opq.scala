package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parametric OPQ — variance-balanced dimension allocation for product
  * quantization (Ge et al., "Optimized Product Quantization", CVPR 2013
  * §4: eigenvalue allocation). Vanilla PQ slices dimensions into blocks
  * in storage order; if variance concentrates in a few dims (the normal
  * case after PCA, and common in learned embeddings), some blocks carry
  * all the signal and quantize poorly while others quantize noise. The
  * parametric fix permutes dimensions so every block receives the same
  * variance profile: rank dims by variance, deal them round-robin to
  * the m blocks ("card-dealing" — each block gets one dim from each
  * variance tier, the greedy balanced form of the paper's eigenvalue
  * allocation; the full OPQ rotation needs an SVD per iteration, which
  * is neither needed for the balance property nor SQL-replayable).
  *
  * SCALE + REPLAY: variance comes from the SAME exact-integer Gram pass
  * as [[graft.operators.Pca]] — one mapPartitions + tree-reduce of
  * BIGINT partials, so the ranking is partition-order-proof and the
  * DuckDB oracle recomputes identical integers (a production variance
  * pass would accumulate only the diagonal; reusing the spec-pinned
  * gramStats keeps one audited accumulator). The permutation itself is
  * dim ints broadcast as literals — free at any corpus size. int64
  * headroom is PCA's bound: n·Σq² ≤ n²·scale² < 2⁶³ → n ≲ 3·10⁵ at
  * scale 10⁴ (beyond that, widen to DECIMAL(38) — documented, not
  * silent).
  */
object Opq {

  /** Same quantization scale as [[graft.operators.Pca]]'s queries. */
  val VarScale: Long = 10000L

  /** Per-dim variance fingerprints (n·Σq² − (Σq)², exact BIGINT) and
    * the balanced permutation: perm(pos) = 0-based source dim stored at
    * permuted position pos, where block b = rank % m, slot s = rank / m,
    * pos = b·(dim/m) + s for dims ranked by (variance desc, dim asc).
    */
  def varianceAllocation(emb: DataFrame, embCol: String, dim: Int, m: Int)
      : (Array[Long], Array[Int]) = {
    val (n, sums, prods) =
      graft.operators.Pca.gramStats(emb, embCol, dim, VarScale)
    val varfp = Array.tabulate(dim)(d =>
      math.multiplyExact(n, prods(d * dim + d)) - sums(d) * sums(d))
    val ranked = (0 until dim).sortBy(d => (-varfp(d), d))
    val w = dim / m
    require(w * m == dim, s"dim $dim must split evenly into $m blocks")
    val perm = new Array[Int](dim)
    for (rn <- 0 until dim) perm((rn % m) * w + rn / m) = ranked(rn)
    (varfp, perm)
  }

  /** Permute an array column: out[pos] = in[perm(pos)] (a pure
    * projection — exact, codegen'd, zero extra passes at scan time).
    */
  def permuted(embCol: String, perm: Array[Int]): org.apache.spark.sql.Column =
    array(perm.map(p => element_at(col(embCol), p + 1)): _*)
}
