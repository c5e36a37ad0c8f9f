package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-center greedy coreset selection (farthest-point sampling — the
  * classic 2-approximation to the k-center cover, and the standard
  * diversity-selection pass for training-data subsets: pick the point
  * farthest from everything picked so far, k times).
  *
  * Spark shape — the INCREMENTAL form: a running per-vector
  * min-distance frame is updated with ONE broadcast row per round
  * (distance to the last pick only), so each round is a single linear
  * pass + a 1-row TakeOrdered argmax; the naive form would re-join all
  * picks every round. k driver rounds with k-bounded driver state —
  * the Bpe/Lloyd iterative discipline.
  *
  * DETERMINISM: distances are the codegen'd FloatVecL2Sq double fold
  * quantized to BIGINT micro-units (same left-to-right order as the
  * oracle's list_sum, so the quantized values are bit-identical
  * cross-engine); argmax tie-break is (min-dist DESC, vec_id ASC); the
  * seed is the smallest id. The whole selection replays as k generated
  * CTE rounds in DuckDB.
  */
object Coreset {

  final case class Pick(step: Long, vecId: Long, radiusFp: Long)

  /** Greedy selection; returns (step, vec_id, radius_fp) where
    * radius_fp is the picked point's distance to the previous picks —
    * the covering-radius trajectory (non-increasing), the coreset's
    * quality curve.
    */
  def kcenter(spark: SparkSession, emb: DataFrame, k: Int,
      idCol: String = "vec_id", embCol: String = "embedding"): Seq[Pick] = {
    import spark.implicits._
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val distFp = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      round(graft.functions.VectorExpressions.l2Sq(a, b) * 1e6).cast("long")
    if (k <= 0) return Seq.empty
    val seed = emb.orderBy(col(idCol).asc).limit(1)
      .select(col(idCol), col(embCol)).collect()
    if (seed.isEmpty) return Seq.empty // empty input: nothing to cover
    val first = seed.head
    val picks = scala.collection.mutable.ArrayBuffer(
      Pick(0L, first.getLong(0), 0L))
    var lastVec = first.getSeq[Float](1).toArray
    // running min distance to the selected set, updated one pick a time
    var mind = emb.select(col(idCol), col(embCol),
        distFp(typedLit(lastVec), col(embCol)).as("md"))
      .localCheckpoint(true)
    try {
      for (step <- 1L until k.toLong) {
        val cand = mind.filter(!col(idCol).isin(picks.map(_.vecId).toSeq: _*))
          .orderBy(col("md").desc, col(idCol).asc).limit(1)
          .select(col(idCol), col(embCol), col("md")).collect()
        if (cand.isEmpty) return picks.toSeq // k > n: the whole set IS the coreset
        val next = cand.head
        picks += Pick(step, next.getLong(0), next.getLong(2))
        lastVec = next.getSeq[Float](1).toArray
        val prev = mind
        mind = mind.select(col(idCol), col(embCol),
            least(col("md"), distFp(typedLit(lastVec), col(embCol))).as("md"))
          .localCheckpoint(true)
        graft.textual.Bpe.unpersistCheckpoint(prev)
      }
      picks.toSeq
    } finally graft.textual.Bpe.unpersistCheckpoint(mind)
  }
}
