package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Product-quantization codebook training: per-block Lloyd (k-means)
  * iterations in FIXED-POINT arithmetic, so the whole trainer is
  * deterministic across engines, partitionings, and summation orders —
  * the property a reproducible 100 TB index build wants, and the
  * property that lets a SQL oracle replay training bit-for-bit.
  *
  * Why fixed point: a float mean's value depends on summation order, so
  * a plain Lloyd trainer can never be cross-engine-compared (round 7
  * verified only the monotonicity INVARIANT). Quantizing inputs to
  * integers makes every data-dependent reduction exact:
  *
  *   - inputs: xq = floor(x · 2^20) — exact, because a float scaled by a
  *     power of two is exactly representable in double, and floor of an
  *     exact double is unambiguous (`round` would hang tie behavior on
  *     engine-specific half-rules);
  *   - re-center sums: Σ xq over a cluster accumulates in BIGINT — exact
  *     in ANY order (the one reduction that is order-sensitive in float
  *     Lloyd); the centroid is CAST(Σ AS DOUBLE)/n, a single correctly-
  *     rounded division → identical bits on every engine;
  *   - distances: (xq − c)² folded left-to-right over w dims (the same
  *     fold-order contract [[graft.functions.FloatVecL2Sq]] shares with
  *     the DuckDB `list_sum` mirror), codegen'd via graft_l2sq_d;
  *   - assignment argmin ties break on code — exact doubles, so the
  *     comparison itself is deterministic.
  *
  * Each iteration is two distributed passes over the subvector frame —
  * assign (broadcast codebook, partial argmin before the exchange) and
  * re-center (one sum/count aggregate) — plus two TINY driver collects:
  * the m×k×w codebook and the m distortion scalars. Driver traffic is
  * O(codebook), never O(data): the same shape MLlib's KMeans uses, kept
  * explicit so the arithmetic stays replayable.
  *
  * Reference context: the reference's ChromaDB collections use HNSW
  * (chromadb_speed_experiment.py:260-266); PQ is the standard
  * alternative memory layout at 100 TB scale (codes are m bytes vs 4·d
  * float bytes), trained here, searched in SparkEntry's ann_pq_top10
  * via ADC + exact re-rank (IVFADC+R, Jégou et al., TPAMI'11).
  */
object Pq {

  /** 2^20: 20 fractional bits of quantization. */
  val QScale: Double = 1048576.0

  /** Quantized embedding frame: (vec_id, emb_q array<double> holding
    * exact integers floor(x·2^20)).
    */
  def quantize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(QScale)).cast("double")).as("emb_q"))

  /** (vec_id, block, sub) exploded quantized-subvector frame. */
  def subFrame(embQ: DataFrame, m: Int, w: Int): DataFrame =
    embQ.select(col("vec_id"),
      posexplode(array((0 until m).map(b => slice(col("emb_q"), b * w + 1, w)): _*))
        .as(Seq("block", "sub")))

  /** Seed codebook: code c of every block = the quantized subvector of
    * vec_id c, for c < k (deterministic, oracle-expressible; requires
    * ids 0..k-1 present — the fixtures' ids are contiguous from 0).
    * Collected to the driver: k×m rows.
    */
  def seedCodebook(sub: DataFrame, k: Int): Seq[(Int, Long, Seq[Double])] =
    sub.filter(col("vec_id") < k)
      .select(col("block"), col("vec_id").cast("long").as("code"), col("sub"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .toSeq

  /** Driver codebook → broadcastable frame (block, code, csub). */
  def codebookDf(spark: SparkSession, cb: Seq[(Int, Long, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cb.toDF("block", "code", "csub")
  }

  /** Nearest-code assignment of every (vec, block) subvector:
    * (vec_id, block, code, d2). Broadcast codebook, ×k expansion
    * collapsed by the partial argmin BEFORE the exchange; ties on code.
    */
  def assignments(sub: DataFrame, cbDf: DataFrame): DataFrame =
    sub.join(broadcast(cbDf), Seq("block"))
      .select(col("vec_id"), col("block"), col("code"),
        VectorExpressions.l2SqD(col("sub"), col("csub")).as("d2"))
      .groupBy(col("vec_id"), col("block"))
      .agg(min(struct(col("d2"), col("code"))).as("m"))
      .select(col("vec_id"), col("block"),
        col("m.code").as("code"), col("m.d2").as("d2"))

  /** Train m blocks × k codes for `iters` Lloyd iterations over the
    * quantized subvectors. Returns (final codebook, per-assignment
    * distortions): distortions has iters+1 entries — entry i is the
    * per-block Σ min-d² measured under codebook i (entry 0 = seed
    * assignment), and the LAST entry is measured under the RETURNED
    * codebook (the final pass records distortion only and does not
    * re-center — a trailing M-step nobody measures would be wasted
    * work and would leave the returned codebook a half-step past the
    * last distortion).
    */
  def train(spark: SparkSession, emb: DataFrame, m: Int, w: Int, k: Int, iters: Int)
      : (Seq[(Int, Long, Seq[Double])], Seq[Map[Int, Double]]) = {
    val (cbs, dists) = trainTrajectory(spark, emb, m, w, k, iters)
    (cbs.last, dists)
  }

  /** [[train]], but returning the FULL trajectory: codebooks(i) is the
    * codebook distortions(i) was measured under (codebooks(0) = seed,
    * codebooks(iters) = final). Because fixed-point Lloyd is
    * deterministic, codebooks(j) of an iters=n run is bit-identical to
    * `train(..., iters = j)._1` — so one long run can serve every
    * consumer that wants a shorter one (the search codebook at j=2 and
    * the 3-iteration monotonicity trajectory share one training).
    */
  def trainTrajectory(spark: SparkSession, emb: DataFrame, m: Int, w: Int, k: Int, iters: Int)
      : (Seq[Seq[(Int, Long, Seq[Double])]], Seq[Map[Int, Double]]) = {
    VectorExpressions.ensureRegistered(spark)
    val sub = subFrame(quantize(emb), m, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cb = seedCodebook(sub, k)
      val codebooks = Seq.newBuilder[Seq[(Int, Long, Seq[Double])]]
      val distortions = Seq.newBuilder[Map[Int, Double]]
      for (i <- 0 to iters) {
        codebooks += cb
        val assigned = assignments(sub, codebookDf(spark, cb))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          distortions += assigned.groupBy(col("block")).agg(sum(col("d2")).as("dist"))
            .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
          if (i < iters) {
            // re-center: exact BIGINT sums per (block, code, dim), one
            // double division at the end — order-independent.
            val means = assigned.join(sub, Seq("vec_id", "block"))
              .select(col("block"), col("code"), posexplode(col("sub")).as(Seq("dim", "v")))
              .groupBy(col("block"), col("code"), col("dim"))
              .agg((sum(col("v").cast("long")).cast("double") / count(lit(1))).as("mv"))
              .groupBy(col("block"), col("code"))
              .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("a"))
              .select(col("block"), col("code"),
                transform(col("a"), x => x.getField("mv")).as("csub"))
              .collect()
              .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2)))
              .toMap
            // empty clusters keep their previous centroid (standard Lloyd)
            cb = cb.map { case (b, c, prev) => (b, c, means.getOrElse((b, c), prev)) }
          }
        } finally assigned.unpersist(blocking = false)
      }
      (codebooks.result(), distortions.result())
    } finally sub.unpersist(blocking = false)
  }
}
