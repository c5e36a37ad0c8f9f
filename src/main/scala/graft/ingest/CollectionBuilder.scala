package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.index.CollectionCatalog

/** The corpus/collection build pipeline — E3 (create_collections.main,
  * cc:476-514): extract-or-load → clean → sequence → embed → base table;
  * then the cumulative "collections" exist as zero-copy prefix views
  * (the reference materializes every prefix — ~1.7M duplicate rows for a
  * 58k corpus, cc:237-268; we don't).
  *
  * Resume semantics preserved (cc:171-253): parse existing collection
  * names for the max built scale (null-tolerant, C5), round up to the
  * next step multiple, and skip already-built names via anti-join (F6).
  */
object CollectionBuilder {

  /** Extract/clean/sequence/embed into the persistent base table.
    * Checkpoint-or-build mirrors the pickle memoization (S5/S6).
    */
  def buildBase(
      spark: SparkSession,
      docs: DataFrame,
      embedder: Embedder,
      basePath: String): DataFrame =
    DocumentIngest.checkpointOrBuild(spark, basePath) {
      embedder.embed(DocumentIngest.clean(docs), "text", "embedding")
        .select(col("doc_id"), col("seq"), col("text"), col("embedding"))
    }

  /** Max pages already built, parsed from existing collection names —
    * invalid names ignored (cc:180-198's try/except).
    */
  def resumePoint(spark: SparkSession, existingNames: Seq[String]): Long = {
    import spark.implicits._
    if (existingNames.isEmpty) 0L
    else existingNames.toDF("name")
      .select(CollectionCatalog.parsePages(col("name")).as("pages"))
      .agg(coalesce(max(col("pages")), lit(0L)))
      .head().getLong(0)
  }

  /** Planned collection specs for a corpus of `total` rows at `step`,
    * including the remainder collection (cc:276-328).
    */
  def planCollections(total: Long, step: Long): Seq[(Int, Long)] = {
    val full = (total / step).toInt
    val specs = (1 to full).map(i => i -> i * step)
    if (total % step != 0) specs :+ ((full + 1) -> total) else specs
  }

  /** Skip-existing: planned minus existing, by name (F6 anti-join). */
  def skipExisting(spark: SparkSession, planned: Seq[String], existing: Seq[String]): Seq[String] = {
    import spark.implicits._
    if (planned.isEmpty) Seq.empty
    else planned.toDF("name")
      .join(existing.toDF("name"), Seq("name"), "left_anti")
      .orderBy("name").as[String].collect().toSeq
  }
}
