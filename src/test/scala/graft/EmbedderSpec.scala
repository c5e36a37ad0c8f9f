package graft

import org.apache.spark.sql.functions._

import graft.embed.TfIdfEmbedder
import graft.functions.VectorFunctions
import graft.model.Tables
import graft.multimodal.Multimodal

class EmbedderSpec extends GraftSpec {
  import spark.implicits._

  test("tf-idf embedder: unit norm, fixed dim, deterministic") {
    val docs = Tables.documents(spark, sfDir).limit(50).cache()
    val m = TfIdfEmbedder.fit(docs, "text", 64)
    val out = m.embed(docs, "text", "emb").cache()
    assert(out.filter(size($"emb") =!= 64).count() === 0)
    val norms = out.select(VectorFunctions.norm($"emb").as("n")).collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // refit + re-embed is bit-identical (determinism is a feature: the
    // oracle-test methodology depends on it, SURVEY.md §7.3)
    val out2 = TfIdfEmbedder.fit(docs, "text", 64).embed(docs, "text", "emb")
    assert(out.select("doc_id", "emb").except(out2.select("doc_id", "emb")).count() === 0)
    // persisted model reloads and reproduces the same embeddings (M1)
    val path = java.nio.file.Files.createTempDirectory("graft_emb").toString + "/model"
    m.save(path)
    val reloaded = graft.embed.TfIdfEmbedderModel.load(path)
    val out3 = reloaded.embed(docs, "text", "emb")
    assert(out.select("doc_id", "emb").except(out3.select("doc_id", "emb")).count() === 0)
  }

  test("multimodal: metadata digests match and the decode stub is deterministic") {
    val docs = Tables.documents(spark, sfDir).limit(20)
    val media = Multimodal.withPayload(docs, "doc_id", "text")
    val meta = Multimodal.metadata(media)
    val checked = meta.join(docs, meta("id") === docs("doc_id"))
      .filter(sha2(encode($"text", "UTF-8"), 256) =!= $"sha256")
    assert(checked.count() === 0)
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.id)
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(_.features.length === Multimodal.DecodeStub.featureDim))
    // histogram features sum to ~1 (normalized by length)
    assert(f1.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
  }
}
