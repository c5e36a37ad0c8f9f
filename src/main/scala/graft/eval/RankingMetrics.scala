package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-aware retrieval metrics — MRR, Precision@k, nDCG@k — the
  * companions to [[RecallAtK]] (the reference's only accuracy metric,
  * `calculate_recall_at_k`, chromadb_acc_experiment.py:539-564): recall
  * ignores WHERE in the top-k a hit lands; these weight it.
  *
  * Binary relevance: an id is relevant iff it appears in the ground
  * truth's top-k. Per query on two (qid, id, rk) rankings:
  * - MRR        = 1/rank of the first relevant retrieved id (0 if none);
  * - Precision  = |relevant ∩ retrieved[:k]| / k;
  * - nDCG@k     = DCG@k / IDCG@k with DCG = Σ_hits 1/log2(rank+1) and
  *                IDCG = Σ_{i=1..min(k,|rel|)} 1/log2(i+1).
  *
  * Float discipline: the log2 discount table is computed ONCE here in
  * Java and shipped to both engines as double literals
  * ([[discounts]] / [[idealDcg]] — `Double.toString` round-trips, so
  * the DuckDB literal parses to the identical bit pattern); the only
  * other float ops are 1.0/rank and sums of ≤ k terms, identical in
  * both engines. No cross-engine `log` parity hazard.
  *
  * Scale posture: both inputs are top-k rankings — ≤ k rows per query —
  * so every join and aggregate here is on frames k× the query count,
  * never data-proportional; the discount table (k rows) broadcasts.
  */
object RankingMetrics {

  /** (rank, 1/log2(rank+1)) for rank = 1..k — the DCG discount. */
  def discounts(k: Int): Seq[(Int, Double)] =
    (1 to k).map(i => (i, 1.0 / (math.log(i + 1.0) / math.log(2.0))))

  /** (n, Σ_{i=1..n} 1/log2(i+1)) for n = 1..k — IDCG for n relevant. */
  def idealDcg(k: Int): Seq[(Int, Double)] =
    discounts(k).scanLeft((0, 0.0)) { case ((_, acc), (i, d)) => (i, acc + d) }.tail

  /** Score a retrieved ranking against a ground-truth ranking. Inputs
    * are (qidCol, idCol, rkCol) frames with rk starting at 1; rows with
    * rk > k are ignored. Output: (qid, n_rel, mrr, precision_k, ndcg_k).
    */
  def evaluate(
      groundTruth: DataFrame,
      retrieved: DataFrame,
      k: Int,
      qidCol: String = "qid",
      idCol: String = "vec_id",
      rkCol: String = "rk"): DataFrame = {
    val spark = groundTruth.sparkSession
    import spark.implicits._
    val disc = broadcast(discounts(k).toDF("rk", "disc"))
    val ideal = broadcast(idealDcg(k).toDF("n_rel", "idcg"))

    val gt = groundTruth.filter(col(rkCol) <= k)
      .select(col(qidCol).as("qid"), col(idCol).as("id"), lit(1).as("rel"))
    val nRel = gt.groupBy(col("qid")).agg(count(lit(1)).cast("int").as("n_rel"))

    val ret = retrieved.filter(col(rkCol) <= k)
      .select(col(qidCol).as("qid"), col(idCol).as("id"), col(rkCol).cast("int").as("rk"))

    ret
      .join(gt, Seq("qid", "id"), "left")
      .join(disc, Seq("rk"))
      .groupBy(col("qid"))
      .agg(
        max(when(col("rel") === 1, lit(1.0) / col("rk")).otherwise(lit(0.0))).as("mrr_raw"),
        (sum(when(col("rel") === 1, lit(1)).otherwise(lit(0))).cast("double") / k)
          .as("precision_raw"),
        sum(when(col("rel") === 1, col("disc")).otherwise(lit(0.0))).as("dcg"))
      .join(nRel, Seq("qid"))
      .join(ideal, Seq("n_rel"))
      .select(col("qid"), col("n_rel").cast("long").as("n_rel"),
        round(col("mrr_raw"), 4).as("mrr"),
        round(col("precision_raw"), 4).as(s"precision_$k"),
        round(col("dcg") / col("idcg"), 4).as(s"ndcg_$k"))
  }

  /** The discount table as a DuckDB VALUES literal — the oracle twin of
    * [[discounts]], same doubles via `Double.toString`.
    */
  def discountsSql(k: Int): String =
    discounts(k).map { case (i, d) => s"($i, $d)" }.mkString(", ")

  /** Oracle twin of [[idealDcg]]. */
  def idealDcgSql(k: Int): String =
    idealDcg(k).map { case (i, d) => s"($i, $d)" }.mkString(", ")
}
