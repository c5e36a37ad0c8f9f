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

  /** An RC4-ENCRYPTED document (standard security handler, V 1 / R 2,
    * 40-bit, empty user password — the PDF 1.1–1.3 encryption every
    * reader supports): O/U computed per the spec's algorithms 2–4 (via
    * [[SimplePdf]]'s shared primitives), every content stream stored as
    * RC4(per-object-key, Flate?(data)), /Encrypt + /ID in the trailer.
    * A reader that ignores encryption sees ciphertext; only the
    * standard key derivation recovers the text.
    */
  def writeEncrypted(pages: Seq[Seq[String]], compress: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val fontObj = 3 + 2 * n
    val encObj = fontObj + 1
    val perm = -4
    val id0 = java.security.MessageDigest.getInstance("MD5")
      .digest(pages.flatten.mkString("\n").getBytes(ISO_8859_1))
    val o = SimplePdf.ownerEntry()
    val key = SimplePdf.fileKey(o, perm, id0)
    val u = SimplePdf.userEntry(key)
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString

    val objs = scala.collection.mutable.ArrayBuffer[String]()
    objs += "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n"
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      objs += s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contObj 0 R >>\nendobj\n"
      val raw = contentFor(lines).getBytes(ISO_8859_1)
      val (plain, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      val data = SimplePdf.rc4(SimplePdf.objectKey(key, contObj, 0), plain)
      objs += s"$contObj 0 obj\n<< /Length ${data.length}$filter >>\nstream\n" +
        new String(data, ISO_8859_1) + "\nendstream\nendobj\n"
    }
    objs += s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
    objs += s"$encObj 0 obj\n<< /Filter /Standard /V 1 /R 2 /Length 40 " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $perm >>\nendobj\n"

    val body = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { ob => val off = body.length; body ++= ob; off }
    val xrefOff = body.length
    body ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    offsets.foreach(off => body ++= f"$off%010d 00000 n \n")
    body ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R " +
      s"/Encrypt $encObj 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n"
    body.toString.getBytes(ISO_8859_1)
  }

  /** An AES-ENCRYPTED document (standard security handler, V 4 / R 4,
    * /CFM /AESV2, AES-128-CBC, empty user password — the PDF 1.6
    * encryption modern producers emit): the rev-4 key derivation (50×
    * MD5 iteration, Alg. 2/3/5 in full via [[SimplePdf]]'s shared
    * primitives), every content stream stored as
    * IV ‖ AES-CBC(per-object sAlT key, Flate?(data)) with PKCS#5
    * padding. IVs are deterministic (MD5 of ID0 ‖ objnum — CBC accepts
    * any IV; determinism keeps fixtures replayable). A reader that
    * ignores encryption sees ciphertext; only the standard derivation
    * plus javax.crypto recovers the text.
    */
  def writeEncryptedAes(pages: Seq[Seq[String]], compress: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val fontObj = 3 + 2 * n
    val encObj = fontObj + 1
    val perm = -44
    val id0 = java.security.MessageDigest.getInstance("MD5")
      .digest(pages.flatten.mkString("\n").getBytes(ISO_8859_1))
    val o = SimplePdf.ownerEntryR(rev = 4, keyLen = 16)
    val key = SimplePdf.fileKeyR(o, perm, id0, rev = 4, keyLen = 16)
    val u = SimplePdf.userEntryR(key, id0, rev = 4)
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
    def ivFor(objNum: Int): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id0 ++ Array((objNum & 0xff).toByte))

    val objs = scala.collection.mutable.ArrayBuffer[String]()
    objs += "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n"
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      objs += s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contObj 0 R >>\nendobj\n"
      val raw = contentFor(lines).getBytes(ISO_8859_1)
      val (plain, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      val data = SimplePdf.aesEncrypt(
        SimplePdf.objectKeyAes(key, contObj, 0), ivFor(contObj), plain)
      objs += s"$contObj 0 obj\n<< /Length ${data.length}$filter >>\nstream\n" +
        new String(data, ISO_8859_1) + "\nendstream\nendobj\n"
    }
    objs += s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
    objs += s"$encObj 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O <${hex(o)}> /U <${hex(u)}> /P $perm >>\nendobj\n"

    val body = new StringBuilder("%PDF-1.6\n")
    val offsets = objs.map { ob => val off = body.length; body ++= ob; off }
    val xrefOff = body.length
    body ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    offsets.foreach(off => body ++= f"$off%010d 00000 n \n")
    body ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R " +
      s"/Encrypt $encObj 0 R /ID [<${hex(id0)}> <${hex(id0)}>] >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n"
    body.toString.getBytes(ISO_8859_1)
  }

  /** A Type0 (CID) font document with /ToUnicode remapping — the
    * layout every modern unicode-text PDF uses: content hex strings
    * carry 2-byte CIDs (here codepoint + `cidOffset`, so naive
    * byte-pair decoding yields garbage and only a reader that applies
    * the CMap recovers the text), the font is
    * Type0/Identity-H/CIDFontType2, and the /ToUnicode CMap maps the
    * CID range back to unicode with a single bfrange. Classic xref
    * layout; same page numbering as [[write]].
    */
  def writeCid(pages: Seq[Seq[String]], cidOffset: Int = 7,
               compress: Boolean = false): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val fontObj = 3 + 2 * n
    val descObj = fontObj + 1
    val cmapObj = fontObj + 2
    def cidHex(s: String): String =
      s.map(c => f"${c.toInt + cidOffset}%04X").mkString
    def contentForCid(lines: Seq[String]): String =
      "BT /F1 12 Tf 72 720 Td " +
        lines.map(l => s"<${cidHex(l)}> Tj").mkString(" 0 -14 Td ") + " ET"

    val objs = scala.collection.mutable.ArrayBuffer[String]()
    objs += "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    objs += s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count $n >>\nendobj\n"
    pages.zipWithIndex.foreach { case (lines, i) =>
      val pageObj = 3 + 2 * i
      val contObj = pageObj + 1
      objs += s"$pageObj 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contObj 0 R >>\nendobj\n"
      val raw = contentForCid(lines).getBytes(ISO_8859_1)
      val (data, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      objs += s"$contObj 0 obj\n<< /Length ${data.length}$filter >>\nstream\n" +
        new String(data, ISO_8859_1) + "\nendstream\nendobj\n"
    }
    objs += s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /GraftCID " +
      s"/Encoding /Identity-H /DescendantFonts [$descObj 0 R] " +
      s"/ToUnicode $cmapObj 0 R >>\nendobj\n"
    objs += s"$descObj 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GraftCID " +
      "/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> >>\nendobj\n"
    // ToUnicode: printable ASCII + the chars the lines actually use,
    // covered by one bfrange over the shifted printable band
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |12 dict begin
         |begincmap
         |1 begincodespacerange
         |<0000> <FFFF>
         |endcodespacerange
         |1 beginbfrange
         |<${f"${0x20 + cidOffset}%04X"}> <${f"${0x7E + cidOffset}%04X"}> <0020>
         |endbfrange
         |endcmap
         |CMapName currentdict /CMap defineresource pop
         |end
         |end""".stripMargin
    objs += s"$cmapObj 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n"

    val body = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.map { o => val off = body.length; body ++= o; off }
    val xrefOff = body.length
    body ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    offsets.foreach(o => body ++= f"$o%010d 00000 n \n")
    body ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n"
    body.toString.getBytes(ISO_8859_1)
  }

  /** The PDF 1.5+ layout modern generators emit: every DICT object
    * (catalog, page tree, pages, font) lives inside one Flate-compressed
    * /Type /ObjStm object stream; only stream objects (page contents,
    * the ObjStm itself) stay top-level; the cross-reference is a
    * /Type /XRef STREAM (W [1 4 1] fields, type-2 entries pointing into
    * the object stream) with no classic `xref` table at all. Same page
    * numbering scheme as [[write]], so the two writers produce
    * byte-different files with identical extracted text — exactly the
    * differential the spec and the `pdf_extract_objstm` oracle row pin.
    */
  def writeObjStm(pages: Seq[Seq[String]], compress: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val fontObj = 3 + 2 * n
    val objStmNum = fontObj + 1
    val xrefNum = fontObj + 2

    // ---- embedded dict objects (the ObjStm payload) ----
    val kids = (0 until n).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    val embedded: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>") ++
        (0 until n).map { i =>
          (3 + 2 * i) ->
            (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
              s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents ${4 + 2 * i} 0 R >>")
        } :+
        (fontObj -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val parts = embedded.map(_._2 + "\n")
    val innerOffsets = parts.scanLeft(0)(_ + _.length).init
    val header = embedded.map(_._1).zip(innerOffsets)
      .map { case (num, off) => s"$num $off" }.mkString(" ") + "\n"
    val stmPayload = (header + parts.mkString).getBytes(ISO_8859_1)
    val stmData = deflate(stmPayload)

    // ---- top-level assembly, tracking byte offsets for the xref ----
    val body = new StringBuilder("%PDF-1.5\n")
    val topOffsets = scala.collection.mutable.Map[Int, Int]()
    def emit(num: Int, obj: String): Unit = {
      topOffsets(num) = body.length
      body ++= obj
    }
    pages.zipWithIndex.foreach { case (lines, i) =>
      val contObj = 4 + 2 * i
      val raw = contentFor(lines).getBytes(ISO_8859_1)
      val (data, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      emit(contObj, s"$contObj 0 obj\n<< /Length ${data.length}$filter >>\nstream\n" +
        new String(data, ISO_8859_1) + "\nendstream\nendobj\n")
    }
    emit(objStmNum, s"$objStmNum 0 obj\n<< /Type /ObjStm /N ${embedded.length} " +
      s"/First ${header.length} /Length ${stmData.length} /Filter /FlateDecode >>\nstream\n" +
      new String(stmData, ISO_8859_1) + "\nendstream\nendobj\n")

    // ---- cross-reference stream: W [1 4 1] ----
    val size = xrefNum + 1
    val xrefOff = body.length
    val entries = java.nio.ByteBuffer.allocate(size * 6)
    def entry(t: Int, f2: Int, f3: Int): Unit = {
      entries.put(t.toByte).putInt(f2).put(f3.toByte)
    }
    val embeddedIdx = embedded.map(_._1).zipWithIndex.toMap
    entry(0, 0, 255) // the free-list head
    (1 until size).foreach { num =>
      if (embeddedIdx.contains(num)) entry(2, objStmNum, embeddedIdx(num))
      else if (num == xrefNum) entry(1, xrefOff, 0)
      else entry(1, topOffsets(num), 0)
    }
    val xrefData = deflate(entries.array())
    body ++= s"$xrefNum 0 obj\n<< /Type /XRef /Size $size /W [1 4 1] /Root 1 0 R " +
      s"/Length ${xrefData.length} /Filter /FlateDecode >>\nstream\n" +
      new String(xrefData, ISO_8859_1) + "\nendstream\nendobj\n"
    body ++= s"startxref\n$xrefOff\n%%EOF\n"
    body.toString.getBytes(ISO_8859_1)
  }
}
