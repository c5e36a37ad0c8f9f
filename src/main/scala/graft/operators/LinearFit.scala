package graft.operators

/** Closed-form ordinary least squares — the simplest TRAINED quality
  * model a data pipeline ships (predicting one doc statistic from
  * others; the coefficients themselves are the diagnostic). Method is
  * textbook normal equations solved by Cramer's rule (public
  * knowledge; Golub & Van Loan §5) — chosen here over iterative
  * solvers for the same reason as operators/Pca's fixed trajectories:
  * the ENTIRE training is two exact steps.
  *
  * DETERMINISM + REPLAY: features are clipped INTEGERS, so the
  * sufficient statistics (n, Σx, Σxy, …) are exact BIGINT sums —
  * partition/reduce order provably cannot perturb them — and the
  * normal-equation determinants are exact integer arithmetic (BigInt
  * on the driver; HUGEINT in the DuckDB oracle: any expansion order
  * yields the same integer). The ONLY floating-point ops are the final
  * correctly-rounded integer→double conversions and one IEEE division
  * per coefficient — identical in both engines, so the trained model
  * hash-matches bit-for-bit.
  *
  * HEADROOM (documented, not silent): with clips x ≤ 2047, y ≤ 16383
  * the matrix entries stay ≤ n·2047² and the 3×3 determinant terms
  * stay ≲ n³·2047⁴·16383² ≈ 4·10³⁵ at n = 5·10⁴ — inside HUGEINT's
  * 1.7·10³⁸. Beyond n ≈ 10⁶ widen the clips/precision deliberately.
  *
  * SCALE: one scan computing 9 integer sums (map-side combine, no
  * shuffle beyond the single-row aggregate) + O(1) driver math — the
  * canonical 100 TB shape for any fixed-dimension linear model.
  */
object LinearFit {

  /** 3×3 determinant over exact integers. */
  def det3(m: Array[Array[BigInt]]): BigInt =
    m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
      m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
      m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))

  /** Cramer solve of A·b = rhs (3×3): each coefficient is ONE
    * correctly-rounded conversion of an exact integer determinant and
    * one IEEE division. None when A is singular.
    */
  def solve3(a: Array[Array[BigInt]], rhs: Array[BigInt])
      : Option[(Double, Double, Double)] = {
    val d = det3(a)
    if (d == 0) None
    else {
      def repl(i: Int): Array[Array[BigInt]] =
        Array.tabulate(3, 3)((r, c) => if (c == i) rhs(r) else a(r)(c))
      Some((
        det3(repl(0)).toDouble / d.toDouble,
        det3(repl(1)).toDouble / d.toDouble,
        det3(repl(2)).toDouble / d.toDouble))
    }
  }
}
