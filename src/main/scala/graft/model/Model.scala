package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Core data model: the reference's unit of data is a ChromaDB
  * "collection" — a named, append-only bag of (id, document, embedding,
  * metadata) records (reference: create_collections.py:149-155,260-263).
  * Spark-native mapping (SURVEY.md §1.4): a Parquet-backed DataFrame with
  * a typed schema; cumulative collections become prefix *views* over one
  * base table rather than 29×-duplicated copies.
  */
final case class VectorRecord(
    id: String,
    document: String,
    embedding: Array[Float],
    pdfName: String,
    pageNum: Int,
    totalPages: Int)

/** A document row as produced by ingest (fixture: documents.parquet). */
final case class Document(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    n_chars: Long)

/** An embedded row (fixture: embeddings.parquet). */
final case class EmbeddingRecord(vec_id: Long, embedding: Array[Float], label: Int)

/** An event row (fixture: events.parquet). */
final case class Event(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double,
    props: String)

object Schemas {
  /** Collection row schema — the reference's fixed row shape
    * (create_collections.py:149-155): id, document, 768-dim float vector,
    * {pdf_name, page_num, total_pages} metadata. Dimension is a parameter
    * (SURVEY.md §1.1); fixtures use 64.
    */
  val collection: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("document", StringType, nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("metadata", StructType(Seq(
      StructField("pdf_name", StringType, nullable = true),
      StructField("page_num", IntegerType, nullable = true),
      StructField("total_pages", IntegerType, nullable = true))), nullable = true)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true),
    StructField("label", IntegerType, nullable = true)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = true),
    StructField("user_id", LongType, nullable = true),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))
}

/** Loaders for the driver-generated fixtures under /root/testdata/sf*. */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Normalize the events `ts` column to a session-TZ TIMESTAMP regardless
    * of the fixture's physical encoding. The driver has shipped three so
    * far: TIMESTAMP(NANOS) (readable only as long via the nanosAsLong
    * legacy flag), timestamp[us] without a timezone (read as
    * TIMESTAMP_NTZ), and plain TIMESTAMP. The NTZ→TIMESTAMP cast is
    * value-preserving because the session timezone is pinned to UTC
    * (build.sbt -Dspark.sql.session.timeZone=UTC).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    case TimestampType => df
    case _ => // TIMESTAMP_NTZ (and any future encoding castable to timestamp)
      df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
  }

  /** events.parquet: single load site for all batch consumers; see
    * [[normalizeEventTs]] for the encoding zoo.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, sfDir, "events"))
  }

  /** Shared streaming source over an events-shaped parquet directory —
    * the single stream-side loader (streaming/EventOps, streaming/
    * StatefulOps delegate here). `readStream` requires a declared schema,
    * and declaring the wrong physical `ts` type fails analysis, so probe
    * the actual footer type with a cheap batch schema read first, declare
    * exactly that, then normalize via [[normalizeEventTs]].
    */
  def eventStream(
      spark: SparkSession,
      parquetDir: String,
      glob: String = "events.parquet",
      options: Map[String, String] = Map.empty): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physicalTs = spark.read
      .option("pathGlobFilter", glob)
      .parquet(parquetDir)
      .schema("ts").dataType
    val readSchema = StructType(Schemas.events.map {
      case f if f.name == "ts" => f.copy(dataType = physicalTs)
      case f => f
    })
    val reader = spark.readStream
      .schema(readSchema)
      .option("pathGlobFilter", glob)
    val withOpts = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
    normalizeEventTs(withOpts.parquet(parquetDir))
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
}
