package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.CollectionCatalog

/** Ingest-side cleaning pipeline (reference: the extract→validate path of
  * create_collections.py).
  *
  * - Non-empty-page filter: `not page_text.strip()` drops the row
  *   (create_collections.py:146-147) → F1.
  * - Null/empty-id filter: `pd.isna(...) or not arxiv_id`
  *   (download_arxiv.py:41-43) → F2.
  * - Validity + sanitization: `is_valid_text` strips and drops
  *   unencodable chars via encode/decode errors='ignore'
  *   (create_collections.py:349-379) → F3; control chars are the Spark
  *   analog of unencodable bytes (JVM strings are already valid UTF-16).
  *
  * All three are plain Catalyst predicates/projections — they push down to
  * the parquet scan, which is exactly what a 100 TB ingest needs.
  */
object DocumentIngest {

  /** Strip control characters (sanitization F3). */
  def sanitize(text: Column): Column = regexp_replace(text, "[\\x00-\\x1f\\x7f]", "")

  /** F1+F2+F3 in one pass, plus recomputed n_chars and the ingest seq. */
  def clean(docs: DataFrame): DataFrame =
    docs
      .filter(col("doc_id").isNotNull)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .withColumn("text", sanitize(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .transform(d => CollectionCatalog.seqFromId(d, "doc_id"))

  /** Checkpoint pattern (S5/S6): the reference pickles extracted pages and
    * skips re-extraction when the pickle exists
    * (create_collections.py:115-123,158-167). Spark-native: a parquet
    * checkpoint read-or-build.
    */
  def checkpointOrBuild(spark: SparkSession, ckptPath: String)(build: => DataFrame): DataFrame =
    scala.util.Try(spark.read.parquet(ckptPath)).getOrElse {
      val df = build
      df.write.mode("overwrite").parquet(ckptPath)
      spark.read.parquet(ckptPath)
    }
}
