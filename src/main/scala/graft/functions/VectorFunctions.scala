package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity as pure Catalyst column expressions.
  *
  * The reference computes L2 distance with a vectorized numpy full scan
  * (`np.linalg.norm(embeddings - query, axis=1)`,
  * chromadb_acc_experiment.py:531) after pulling every embedding to the
  * client (ac:521) — the anti-pattern at scale. Here the same math is a
  * per-row expression over `array<float>` columns built from Spark's
  * higher-order functions (`zip_with` + `aggregate`), so it runs inside
  * whole-stage codegen, distributed, with no driver-side collect.
  *
  * All arithmetic is widened to double *before* the fold so the
  * left-to-right summation matches the DuckDB oracle bit-for-bit at the
  * rounding precision used in oracle-checked queries.
  */
object VectorFunctions {

  /** Cast array<float> → array<double> (precision parity with the oracle). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product: sum_i a_i * b_i. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 distance: sum_i (a_i - b_i)^2. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** L2 (Euclidean) distance — the reference's metric (ChromaDB default
    * HNSW space is L2; create_collections.py:260-263 never overrides it).
    */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** L2 norm of one vector. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity: dot(a,b) / (|a||b|). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // Codegen'd fast paths (identical arithmetic, see VectorExpressions;
  // callers must VectorExpressions.ensureRegistered(spark) first).

  def l2Fast(a: Column, b: Column): Column = sqrt(VectorExpressions.l2Sq(a, b))

  def cosineFast(a: Column, b: Column): Column =
    VectorExpressions.dot(a, b) /
      (sqrt(VectorExpressions.dot(a, a)) * sqrt(VectorExpressions.dot(b, b)))
}
