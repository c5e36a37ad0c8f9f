package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recall@K — the reference's accuracy metric
  * (`calculate_recall_at_k`, chromadb_acc_experiment.py:539-564;
  * formula README.md:31): |GT[:k] ∩ RET[:k]| / |GT[:k]|.
  *
  * Edge-case semantics preserved exactly (SURVEY.md §7.4):
  * - empty ground truth or empty retrieved → 0.0 (ac:551-552);
  * - the denominator is |GT[:k]|, NOT k (ac:562) — matters when the
  *   collection holds fewer than k rows.
  *
  * Pure built-ins (`slice`/`array_intersect`/`size`): no UDAF, fully
  * codegen'd, and expressible 1:1 in the DuckDB oracle.
  */
object RecallAtK {

  /** Recall@k over two ordered id arrays. Null arrays are guarded
    * explicitly (not via size(null)) so the 0.0 edge semantics hold even
    * under legacy sizeOfNull = -1 sessions (ANSI off).
    */
  def recall(gt: Column, ret: Column, k: Int): Column = {
    val gtK  = slice(gt, 1, k)
    val retK = slice(ret, 1, k)
    when(gt.isNull || ret.isNull || size(gtK) <= 0 || size(retK) <= 0, lit(0.0))
      .otherwise(size(array_intersect(gtK, retK)).cast("double") / size(gtK).cast("double"))
  }

  /** Join two top-k result sets (qid, id, rk) into per-query ordered id
    * arrays and score recall at each requested k. Aggregation happens on
    * ≤ k rows per query — trivially scalable.
    */
  def evaluate(
      groundTruth: DataFrame,
      retrieved: DataFrame,
      ks: Seq[Int],
      qidCol: String = "qid",
      idCol: String = "vec_id",
      rkCol: String = "rk"): DataFrame = {
    def ranked(df: DataFrame, outCol: String): DataFrame =
      df.groupBy(col(qidCol))
        .agg(transform(
          array_sort(collect_list(struct(col(rkCol).as("rk"), col(idCol).as("id")))),
          s => s.getField("id")).as(outCol))
    val gt  = ranked(groundTruth, "gt_ids")
    val ret = ranked(retrieved, "ret_ids")
    val joined = gt.join(ret, Seq(qidCol), "left")
    ks.foldLeft(joined) { (df, k) =>
      df.withColumn(s"recall_$k", round(recall(col("gt_ids"), col("ret_ids"), k), 4))
    }.select(col(qidCol) +: ks.map(k => col(s"recall_$k")): _*)
  }
}
