package graft

import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.multimodal.Multimodal

class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  private lazy val media =
    Multimodal.withPayload(Tables.documents(spark, sfDir), "doc_id", "text").cache()

  test("frameSample: frame count law and frame sizes") {
    val stride = 100
    val frameLen = 32
    val frames = Multimodal.frameSample(media, stride, frameLen)
    // per-doc count == ceil(byte_len / stride) for non-empty payloads
    val counts = frames.groupBy($"id").agg(count(lit(1)).as("n"), max($"n_frames").as("declared"))
    assert(counts.filter($"n" =!= $"declared").count() === 0)
    val expected = media.select($"id", octet_length($"payload").as("len"))
      .filter($"len" > 0)
      .select($"id", expr("(len - 1) div 100 + 1").as("n"))
    assert(counts.select($"id", $"n").except(expected).count() === 0)
    assert(expected.except(counts.select($"id", $"n")).count() === 0)
    // every frame is at most frameLen bytes; only a doc's last frame may be shorter
    assert(frames.filter(octet_length($"frame") > frameLen).count() === 0)
    val short = frames.filter(octet_length($"frame") < frameLen)
      .join(counts, Seq("id")).filter($"frame_idx" =!= $"n" - 1)
    assert(short.count() === 0)
  }

  test("frameSample: frame_idx 0 digest equals md5 of the payload prefix") {
    val frames = Multimodal.frameSample(media, 256, 64)
    val first = frames.filter($"frame_idx" === 0).select($"id", $"frame_md5")
    val direct = media.filter(octet_length($"payload") > 0)
      .select($"id", md5(expr("substring(payload, 1, 64)")).as("frame_md5"))
    assert(first.except(direct).count() === 0 && direct.except(first).count() === 0)
  }

  test("resizeStub: fixed-length thumbnails, deterministic") {
    val thumbs = Multimodal.resizeStub(spark, media, outLen = 16)
    assert(thumbs.filter(_._2.length != 16).count() === 0)
    assert(thumbs.count() === media.count())
    // deterministic: running twice yields identical bytes
    val a = thumbs.collect().map { case (id, b) => id -> b.toSeq }.toMap
    val b = Multimodal.resizeStub(spark, media, outLen = 16)
      .collect().map { case (id, bs) => id -> bs.toSeq }.toMap
    assert(a === b)
  }

  test("resizeStub: constant payload averages to the constant") {
    val one = Seq((1L, Array.fill[Byte](64)(42))).toDF("id", "payload")
    val out = Multimodal.resizeStub(spark, one).head()
    assert(out._2.forall(_ == 42))
  }
}
