package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Product-quantization codebook training: per-block Lloyd (k-means)
  * iterations seeded from the per-label seed subvectors.
  *
  * Each iteration is two distributed passes per the WHOLE vector set —
  * assign (broadcast codebook, codegen'd l2, partial argmin before the
  * exchange) and re-center (explode to (block, code, dim), one avg
  * aggregate) — plus two TINY driver collects: the k×m×w codebook
  * (10×4×16 floats here) and the m distortion scalars. That driver
  * traffic is O(codebook), never O(data): the same shape MLlib's
  * KMeans uses, kept explicit here so the iteration count and
  * arithmetic stay deterministic.
  *
  * Training quality is NOT oracle-checkable (a float mean's value
  * depends on summation order, so no cross-engine bit-parity), but
  * Lloyd's INVARIANT is: per-block distortion is non-increasing across
  * iterations (both half-steps are projections). The pq_train_monotone
  * query emits exactly that verdict per (block, iter) — computed from
  * real distortions in-query, pinned to literal TRUE by the oracle —
  * the same discipline as distinct_users_approx's error bound.
  */
object Pq {

  /** (vec_id, block, sub) exploded subvector frame. */
  def subFrame(emb: DataFrame, m: Int, w: Int): DataFrame =
    emb.select(col("vec_id"),
      posexplode(array((0 until m).map(b => slice(col("embedding"), b * w + 1, w)): _*))
        .as(Seq("block", "sub")))

  /** Seed codebook rows collected to the driver: (block, code, centroid). */
  def seedCodebook(emb: DataFrame, m: Int, w: Int): Seq[(Int, Long, Seq[Float])] = {
    val seeds = emb.groupBy(col("label")).agg(min(col("vec_id")).as("seed_id"))
    emb.select(col("vec_id").as("seed_id"), col("embedding"))
      .join(broadcast(seeds), Seq("seed_id"))
      .select(col("label").cast("long").as("code"),
        posexplode(array((0 until m).map(b => slice(col("embedding"), b * w + 1, w)): _*))
          .as(Seq("block", "csub")))
      .collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getSeq[Float](2)))
      .toSeq
  }

  /** `iters` Lloyd iterations. Returns (final codebook, per-iteration
    * distortions): distortions(i) = Σ_blocks-map of block → Σ min-d²
    * AFTER the assignment of iteration i (i = 0 is the seed
    * assignment).
    */
  def train(spark: SparkSession, emb: DataFrame, m: Int, w: Int, iters: Int)
      : (Seq[(Int, Long, Seq[Float])], Seq[Map[Int, Double]]) = {
    import spark.implicits._
    VectorExpressions.ensureRegistered(spark)
    val sub = subFrame(emb, m, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cb = seedCodebook(emb, m, w)
      val distortions = Seq.newBuilder[Map[Int, Double]]
      for (_ <- 0 to iters) {
        val cbDf = cb.toDF("block", "code", "csub")
        val assigned = sub.join(broadcast(cbDf), Seq("block"))
          .select(col("vec_id"), col("block"), col("code"),
            VectorExpressions.l2Sq(col("sub"), col("csub")).as("d2"))
          .groupBy(col("vec_id"), col("block"))
          .agg(min(struct(col("d2"), col("code"))).as("m"))
          .select(col("vec_id"), col("block"),
            col("m.code").as("code"), col("m.d2").as("d2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          distortions += assigned.groupBy(col("block")).agg(sum(col("d2")).as("dist"))
            .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
          // re-center: mean per (block, code, dim), float-cast once
          val means = assigned.join(sub, Seq("vec_id", "block"))
            .select(col("block"), col("code"), posexplode(col("sub")).as(Seq("dim", "v")))
            .groupBy(col("block"), col("code"), col("dim"))
            .agg(avg(col("v")).as("mv"))
            .groupBy(col("block"), col("code"))
            .agg(array_sort(collect_list(struct(col("dim"), col("mv")))).as("a"))
            .select(col("block"), col("code"),
              transform(col("a"), x => x.getField("mv").cast("float")).as("csub"))
            .collect()
            .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Float](2)))
            .toMap
          // empty clusters keep their previous centroid (standard Lloyd)
          cb = cb.map { case (b, c, prev) => (b, c, means.getOrElse((b, c), prev)) }
        } finally assigned.unpersist(blocking = false)
      }
      (cb, distortions.result())
    } finally sub.unpersist(blocking = false)
  }
}
