package graft.index

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.VectorRecord

/** Collection catalog: names, cumulative prefix views, counts.
  *
  * The reference materializes a *cumulative* collection per scale step —
  * collection k re-adds ALL pages [0, k·step) (create_collections.py:237-268,
  * prefix slice `all_texts[:end_idx]` at 266-268), duplicating ~1.7M page
  * rows for a 58k corpus. Spark-native design (SURVEY.md §1.4): ONE base
  * table with a monotone `seq` column; collection k is the predicate
  * `seq <= k·step` — a zero-copy view that Catalyst prunes like any other
  * filter. At 100 TB this is the difference between 29× storage and 1×.
  */
object CollectionCatalog {

  /** Collection naming, `collection_{idx:04d}_{pages}pages`
    * (create_collections.py:239). */
  def collectionName(idx: Column, pages: Column): Column =
    format_string("collection_%04d_%dpages", idx, pages)

  /** Parse a collection name back to its page count — the reference parses
    * names at startup to find the resume point (create_collections.py:180-198:
    * split('_'), strip 'pages', int()). Invalid names → null, mirroring the
    * reference's try/except; a regex guard keeps ANSI mode (Spark 4
    * default) from throwing on malformed input.
    */
  def parsePages(name: Column): Column = {
    val digits = regexp_extract(name, "^collection_[0-9]+_([0-9]+)pages$", 1)
    when(digits === "", lit(null).cast("long")).otherwise(digits.cast("long"))
  }

  /** Assign the global ingest sequence (SURVEY.md §2.5 W2).
    *
    * NOTE scale: a global row_number window has a single-partition sort —
    * fine for re-deriving order from small dims, wrong for 100 TB. When the
    * source already carries a dense monotone key (our fixtures' doc_id; the
    * reference's list position), prefer [[seqFromId]].
    */
  def withSeq(df: DataFrame, orderCols: Seq[String]): DataFrame =
    df.withColumn("seq", row_number().over(Window.orderBy(orderCols.map(col): _*)).cast("long"))

  /** Zero-shuffle seq when a dense monotone id already exists: seq = id + 1
    * (1-based, matching the reference's 1-based page numbering,
    * create_collections.py:155).
    */
  def seqFromId(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("seq", col(idCol) + lit(1L))

  /** The cumulative-collection prefix view: rows with seq <= endIdx
    * (SURVEY.md §2.2 F5). A view, not a copy.
    */
  def prefixView(base: DataFrame, endIdx: Long): DataFrame =
    base.filter(col("seq") <= lit(endIdx))

  /** Typed facade over the collection row shape (Schemas.collection):
    * flattens the metadata struct into a Dataset[VectorRecord], so
    * callers who want compile-time field checking and typed lambdas get
    * them without changing the storage schema. The select is a pure
    * projection — column pruning and filter pushdown still reach the
    * parquet scan underneath.
    */
  def typed(df: DataFrame): Dataset[VectorRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col("id"),
      col("document"),
      col("embedding"),
      col("metadata.pdf_name").as("pdfName"),
      col("metadata.page_num").as("pageNum"),
      col("metadata.total_pages").as("totalPages")).as[VectorRecord]
  }

  /** Per-collection document counts for the whole cumulative chain, in one
    * pass: bucket rows by which step they land in, then a running sum over
    * buckets — O(n) + a tiny window over (n/step) rows, instead of one
    * count-job per collection (the reference's collection.count() loop,
    * chromadb_speed_experiment.py:399-418).
    */
  def cumulativeCounts(base: DataFrame, step: Long): DataFrame = {
    val buckets = base
      .groupBy(ceil(col("seq").cast("double") / lit(step.toDouble)).cast("long").as("cidx"))
      .agg(count(lit(1)).as("bucket_count"))
    val w = Window.orderBy(col("cidx")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("num_documents", sum(col("bucket_count")).over(w))
      .select(
        collectionName(col("cidx"), col("cidx") * lit(step)).as("collection"),
        col("cidx"),
        col("num_documents"))
      .orderBy(col("cidx"))
  }
}
