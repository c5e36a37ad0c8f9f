package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary sign hashing — 1-bit-per-dimension quantization with Hamming
  * distance search (the thresholded binary-code family: Weiss et al.
  * "Spectral Hashing" NIPS'08 / Gong & Lazebnik "ITQ" CVPR'11 use
  * learned rotations before exactly this sign step; the data-median
  * threshold is their standard zero-centering). A 64-dim float vector
  * becomes ONE BIGINT: 64× less memory bandwidth per candidate, and
  * the distance is a single XOR + POPCNT — the cheapest possible scan
  * at 100 TB, used as a coarse pass before exact re-rank (same
  * ADC-then-re-rank shape as ann_pq_top10).
  *
  * DETERMINISM + REPLAY: thresholds are per-dim LOWER MEDIANS of the
  * exact-integer quantized values (floor(x·10⁴ + ½) — the Pca/Opq
  * scale): the ⌈n/2⌉-th smallest value of a column is a pure function
  * of the value multiset, so partitioning cannot perturb it, and DuckDB
  * selects the identical element. Bits are strict `q > thr` (ties → 0);
  * 32 dims pack per WORD (bit d worth 2^d, summed — disjoint powers,
  * so the sum IS the bit pattern). Two words cover 64 dims; 32-bit
  * words keep every value positive, which both engines shift and sum
  * without overflow semantics entering the picture (DuckDB raises on
  * `1::BIGINT << 63`; Spark wraps — neither behavior is ever reached).
  *
  * SCALE NOTE: the per-dim median here is exact (one n×dim explode +
  * ranking window — fine at fixture sizes, heavy at 100 TB); a
  * production build would use approximate percentiles and FREEZE the
  * thresholds with the index, which changes nothing downstream — codes
  * and search replay identically from any frozen threshold vector.
  */
object BinaryHash {

  /** Same quantization scale as Pca / Opq.VarScale. */
  val QScale: Double = 10000.0

  /** Quantized column: array<bigint> of floor(x·QScale + ½). */
  def quantized(embCol: String): Column =
    transform(col(embCol),
      x => floor(x.cast("double") * lit(QScale) + lit(0.5)).cast("long"))

  /** Per-dim lower-median thresholds of the quantized values, collected
    * to the driver (dim longs — parameter-bounded). Deterministic: the
    * ⌈n/2⌉-th smallest element per dim.
    */
  def thresholds(emb: DataFrame, embCol: String, dim: Int): Array[Long] = {
    val n = emb.count()
    val mid = (n + 1) / 2
    val rows = emb.select(posexplode(quantized(embCol)).as(Seq("d", "q")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("d")).orderBy(col("q"))))
      .filter(col("rn") === mid)
      .select(col("d"), col("q"))
      .collect()
    val thr = new Array[Long](dim)
    rows.foreach(r => thr(r.getInt(0)) = r.getLong(1))
    thr
  }

  /** One packed 32-dim sign WORD: Σ_{d∈[from,from+32)} 2^(d−from) ·
    * [q_d > thr_d] — disjoint powers, so the sum is the OR; always
    * positive. Codegen'd column expression against broadcast threshold
    * literals.
    */
  def codeWord(embCol: String, thr: Array[Long], from: Int): Column = {
    val q = quantized(embCol)
    (from until math.min(from + 32, thr.length)).map { d =>
      when(element_at(q, d + 1) > lit(thr(d)), lit(1L << (d - from))).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two packed words: POPCNT(a XOR b). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
