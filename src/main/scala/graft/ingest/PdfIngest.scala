package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S4: file → per-page text extraction, the reference's
  * `PDFProcessor.extract_text` (create_collections.py:29-53): one input
  * file yields N page rows; a page that fails to parse yields an empty
  * string placeholder (cc:41-47) so page numbering stays aligned.
  *
  * Spark shape (SURVEY.md §2.11): binaryFile scan → extraction UDF
  * returning array<string> → posexplode — no custom Generator needed.
  * The parser is pluggable ([[PageExtractor]]):
  * [[SimplePdfExtractor]] is the REAL pure-JDK extractor for the
  * common machine-written subset (raw/Flate streams, Tj/'/"/TJ text —
  * see [[SimplePdf]]; proven on genuine PDFs in SimplePdfSpec and the
  * oracle-checked `pdf_extract_pages` roundtrip);
  * [[TextPayloadExtractor]] remains the extractor for the pre-extracted
  * TEXT fixtures (FIXTURES.md), which are not PDF bytes at all.
  */
trait PageExtractor extends Serializable {
  /** All pages of one document; parse failure of page i → "" at index i. */
  def extractPages(fileName: String, payload: Array[Byte]): Seq[String]
}

/** Treats the payload as UTF-8 text; pages are blank-line-separated
  * blocks. Deterministic; per-"page" decode errors yield "".
  */
object TextPayloadExtractor extends PageExtractor {
  def extractPages(fileName: String, payload: Array[Byte]): Seq[String] = {
    val text = try new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    catch { case _: Throwable => return Seq("") }
    // exact "\n\n" separator (not \n\s*\n): a whitespace-only page stays a
    // positional placeholder ("" after trim), preserving page numbering
    // like the reference's per-page failure placeholder (cc:41-47)
    text.split("\n\n", -1).toSeq.map(_.trim)
  }
}

object PdfIngest {

  /** binaryFile-scan DataFrame (path, content) → one row per page with
    * the reference's id scheme `{stem}_page_{n}` (cc:155, 1-based) and
    * {pdf_name, page_num} metadata (cc:150-154).
    */
  def extractPages(files: DataFrame, extractor: PageExtractor): DataFrame = {
    val extract = udf((name: String, payload: Array[Byte]) =>
      extractor.extractPages(name, payload))
    val stem = regexp_extract(element_at(split(col("path"), "/"), -1), "^(.*?)(\\.[^.]*)?$", 1)
    files
      .select(stem.as("pdf_name"), extract(col("path"), col("content")).as("pages"))
      .select(col("pdf_name"), posexplode(col("pages")).as(Seq("pos", "text")))
      .select(
        concat(col("pdf_name"), lit("_page_"), (col("pos") + 1).cast("string")).as("id"),
        col("pdf_name"),
        (col("pos") + 1).as("page_num"),
        col("text"))
  }

  /** Full S3+S4+F1 pipeline: glob-scan a directory of binary docs,
    * extract pages, drop empty ones (cc:146-147). `limit` mirrors the
    * reference's max_files cap (cc:103-104, O3).
    */
  def ingestDirectory(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      glob: String = "*",
      extractor: PageExtractor = TextPayloadExtractor,
      limit: Option[Int] = None): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("content"))
    val limited = limit.map(files.limit).getOrElse(files)
    extractPages(limited, extractor)
      .filter(length(trim(col("text"))) > 0)
  }
}
