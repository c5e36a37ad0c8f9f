package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.search.IvfIndex
import graft.streaming.IndexMaintenance

class IndexMaintenanceSpec extends GraftSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir).cache()
  private lazy val cent = IvfIndex.seedCentroids(emb, 8).cache()

  test("streamed index append runs more than one micro-batch") {
    val idx = IndexMaintenance.maintainFromBatch(spark, emb, cent, nFiles = 3)
    val batches = idx.select("batch_id").distinct().count()
    assert(batches >= 2, s"expected multiple micro-batches, got $batches")
  }

  test("streamed index equals the bulk assignment regardless of batching") {
    val streamed = IndexMaintenance.maintainFromBatch(spark, emb, cent, nFiles = 4)
      .select(col("vec_id"), col("cell"))
    val bulk = IvfIndex.assign(emb, cent).select(col("vec_id"), col("cell"))
    assert(streamed.count() === emb.count(), "every vector indexed exactly once")
    assert(streamed.exceptAll(bulk).isEmpty && bulk.exceptAll(streamed).isEmpty)
  }

  test("re-running against the same checkpoint does not duplicate rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_idx_idem")
    val srcDir = base.resolve("src").toString
    val indexDir = base.resolve("index").toString
    val ckptDir = base.resolve("ckpt").toString
    emb.repartition(2).write.parquet(srcDir)
    val q1 = IndexMaintenance.streamIndexAppend(spark, srcDir, indexDir, ckptDir, cent)
    try q1.processAllAvailable() finally q1.stop()
    // second run, same checkpoint: the file-source ledger already has
    // every input file, so no batch fires and no rows are appended
    val q2 = IndexMaintenance.streamIndexAppend(spark, srcDir, indexDir, ckptDir, cent)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(indexDir).count() === emb.count())
  }
}
