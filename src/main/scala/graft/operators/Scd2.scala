package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 history: turn a keyed stream of
  * full-row versions into validity intervals — each version valid from
  * its own sequence number until the key's next version (open-ended for
  * the current one). The warehouse-side complement of [[CdcMerge]]:
  * MERGE keeps only the latest row per key; SCD2 keeps them all and
  * makes "state as of seq S" a range predicate.
  *
  * Plan: one hash shuffle on `key`, then a per-key `lead` window — the
  * window partitions by the same key the exchange hashed on, so no
  * second shuffle, and no key ever funnels through a global sort. At
  * 100 TB the history table is append-only and partitioned by key
  * range; a rebuild is this one window pass.
  */
object Scd2 {

  /** Version rows (`key`, `seqCol`, payload...) → the same rows with
    * `valid_from` (= seq), `valid_to` (next version's seq, null while
    * current) and `is_current`.
    */
  def history(versions: DataFrame, key: String, seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol))
    versions
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("valid_from", col(seqCol))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
