package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition transforms.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment — see [[DecodeStub]]); everything Spark-side is real:
  * schema, binary column handling, partition-batched UDF shape, and the
  * metadata extraction that IS engine-portable (sizes, digests, magic
  * bytes). At 100 TB the payloads live in parquet binary columns (or
  * object-store paths) and the per-partition transform is the unit of
  * parallelism — identical plumbing to what mapInPandas does in PySpark.
  */
object Multimodal {

  final case class MediaRecord(id: Long, payload: Array[Byte])
  final case class MediaFeatures(id: Long, byte_len: Int, features: Array[Float])

  /** Attach a binary payload column (fixtures carry text; a real corpus
    * carries image/audio bytes — the column type and downstream plumbing
    * are the same).
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), encode(col(textCol), "UTF-8").as("payload"))

  /** Engine-portable metadata over opaque binary: length, SHA-256, magic
    * prefix. Pure built-ins — pushes down, codegen'd.
    */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("id"),
      octet_length(col("payload")).as("byte_len"),
      sha2(col("payload"), 256).as("sha256"),
      hex(substring(col("payload"), 1, 4)).as("magic_hex"))

  /** DECODE STUB — stands in for an image/audio decoder (the real decoder
    * is a per-partition batched native call; none is available in this
    * container). Deterministic fake: "features" are a fixed-size byte
    * histogram-derived vector, so tests exercise the exact batching,
    * schema, and partitioning a real decoder would use.
    */
  object DecodeStub {
    val featureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) { hist(java.lang.Byte.toUnsignedInt(payload(i)) % featureDim) += 1f; i += 1 }
      val n = math.max(payload.length, 1).toFloat
      hist.map(_ / n)
    }
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * path: one iterator per partition, records processed in order, no
    * driver involvement.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map(r => MediaFeatures(r.id, r.payload.length, DecodeStub.decode(r.payload)))
      }
  }
}
