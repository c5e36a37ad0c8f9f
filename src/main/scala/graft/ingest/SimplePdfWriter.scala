package graft.ingest

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Deflater

/** Minimal but VALID PDF writer (correct xref offsets, /Pages tree,
  * Helvetica Type1 font, optional /FlateDecode) — the generator half of
  * the S4 story: with no PDF jar in the environment, the extractor is
  * proven on genuine PDF bytes this writer emits (SimplePdfSpec) and on
  * an oracle-checked roundtrip row (`pdf_extract_pages`), the same
  * generate-then-decode discipline as the ImageIO PNG path.
  */
object SimplePdfWriter {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private def contentFor(lines: Seq[String]): String =
    "BT /F1 12 Tf 72 720 Td " +
      lines.map(l => s"(${esc(l)}) Tj").mkString(" 0 -14 Td ") + " ET"

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One document; `pages` holds each page's lines. `contentOverride`
    * substitutes a raw content stream for page 0 (spec hook).
    */
  def write(pages: Seq[Seq[String]], compress: Boolean = false,
            contentOverride: Option[String] = None): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val fontObj = 3 + 2 * n
    val objs = scala.collection.mutable.ArrayBuffer[String]()
    objs += "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n"
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      objs += s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contObj 0 R >>\nendobj\n"
      val content = (if (i == 0) contentOverride else None).getOrElse(contentFor(lines))
      val raw = content.getBytes(ISO_8859_1)
      val (data, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      objs += s"$contObj 0 obj\n<< /Length ${data.length}$filter >>\nstream\n" +
        new String(data, ISO_8859_1) + "\nendstream\nendobj\n"
    }
    objs += s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"

    val body = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { o => val off = body.length; body ++= o; off }
    val xrefOff = body.length
    body ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    offsets.foreach(o => body ++= f"$o%010d 00000 n \n")
    body ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n"
    body.toString.getBytes(ISO_8859_1)
  }
}
