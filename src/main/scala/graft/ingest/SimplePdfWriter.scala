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

  /** LZW encoder (the generator half of [[SimplePdf.lzwDecode]]):
    * greedy longest-match, MSB-first variable-width codes, leading
    * clear code, EOD terminator, clear+reset when the dictionary
    * fills. The width schedule is the same nextCode-driven formula the
    * decoder applies, evaluated after every dictionary add, so both
    * sides widen in lockstep (`earlyChange` 1 is the PDF default).
    */
  def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8
      }
    }
    def widthFor(nextCode: Int): Int = {
      val n = nextCode + earlyChange
      if (n < 512) 9 else if (n < 1024) 10 else if (n < 2048) 11 else 12
    }
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    var nextCode = 258
    def codeOf(s: Vector[Byte]): Int =
      if (s.length == 1) s(0) & 0xff else dict(s)
    emit(256)
    var cur = Vector.empty[Byte]
    var i = 0
    while (i < data.length) {
      val ext = cur :+ data(i)
      if (ext.length == 1 || dict.contains(ext)) cur = ext
      else {
        emit(codeOf(cur))
        if (nextCode < 4096) {
          dict(ext) = nextCode; nextCode += 1
          // the decoder's dictionary lags this one by exactly one add
          // (it learns an entry only on the NEXT code), so the width for
          // the next emitted code is widthFor(nextCode - 1) — bumping at
          // the same nextCode as the decoder would widen one code early
          // relative to it and desynchronize every boundary
          width = math.min(12, widthFor(nextCode - 1))
        } else { // dictionary full: clear and restart
          emit(256); dict.clear(); nextCode = 258; width = 9
        }
        cur = Vector(data(i))
      }
      i += 1
    }
    if (cur.nonEmpty) emit(codeOf(cur))
    emit(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** PNG-predictor-encode (the generator half of
    * [[SimplePdf.undoPredictor]]): rows of `columns` bytes, each
    * prefixed with its filter byte. Row i uses filter i % 5, so one
    * fixture exercises None/Sub/Up/Average/Paeth. Input length must be
    * a multiple of `columns` (content streams pad with spaces — inert
    * past the ET operator).
    */
  def pngPredict(data: Array[Byte], columns: Int): Array[Byte] = {
    require(data.length % columns == 0, "pad input to a row multiple first")
    val nRows = data.length / columns
    val out = new Array[Byte](nRows * (columns + 1))
    var r = 0
    while (r < nRows) {
      val ft = r % 5
      out(r * (columns + 1)) = ft.toByte
      var i = 0
      while (i < columns) {
        val x = data(r * columns + i) & 0xff
        val left = if (i >= 1) data(r * columns + i - 1) & 0xff else 0
        val up = if (r >= 1) data((r - 1) * columns + i) & 0xff else 0
        val ul = if (r >= 1 && i >= 1) data((r - 1) * columns + i - 1) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x - left
          case 2 => x - up
          case 3 => x - (left + up) / 2
          case _ =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            x - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        out(r * (columns + 1) + 1 + i) = v.toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** The LZW twin of [[write]]: content streams stored as
    * /Filter /LZWDecode, optionally behind a PNG /Predictor (content
    * space-padded to a row multiple — inert past ET). The layout older
    * arXiv-era generators emit, which is the reference's actual corpus
    * (dl:56-57).
    */
  def writeLzw(pages: Seq[Seq[String]], predictor: Int = 0,
               columns: Int = 16, earlyChange: Int = 1): Array[Byte] = {
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
      var raw = contentFor(lines).getBytes(ISO_8859_1)
      val parms = new StringBuilder()
      if (earlyChange != 1) parms ++= s" /EarlyChange $earlyChange"
      if (predictor >= 10) {
        val pad = (columns - raw.length % columns) % columns
        raw = raw ++ Array.fill[Byte](pad)(' ')
        raw = pngPredict(raw, columns)
        parms ++= s" /Predictor $predictor /Columns $columns"
      }
      val data = lzwEncode(raw, earlyChange)
      val dp = if (parms.nonEmpty) s" /DecodeParms <<${parms.toString} >>" else ""
      objs += s"$contObj 0 obj\n<< /Length ${data.length} /Filter /LZWDecode$dp >>\nstream\n" +
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

  /** An AES-256 / R6 ENCRYPTED document (PDF 2.0's /AESV3 handler,
    * standard security handler V 5 / R 6): the U/UE and O/OE pairs
    * carry the SHA-2-hardened password hashes (ISO 32000-2 Algorithm
    * 2.B via [[SimplePdf.hash2B]]) and the AES-wrapped 256-bit file
    * key; every stream is AES-256-CBC under that ONE file key (V5 has
    * no per-object keys). Non-empty passwords are real here — R6
    * hashes the password itself, so this writer/reader pair closes the
    * "empty user password only" limitation for the modern handler.
    * All material (file key, salts, IVs) is derived deterministically
    * from the content so fixtures are reproducible.
    */
  def writeEncryptedAes256(pages: Seq[Seq[String]], userPassword: String = "",
                           ownerPassword: String = "own3r",
                           compress: Boolean = true): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val n = pages.length
    val fontObj = 3 + 2 * n
    val encObj = fontObj + 1
    val perm = -44
    def sha256(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      parts.foreach(d.update)
      d.digest()
    }
    val seed = sha256(pages.flatten.mkString("\n").getBytes(ISO_8859_1))
    val fileKey = sha256(seed, "filekey".getBytes(ISO_8859_1))
    def salt(tag: String): Array[Byte] = sha256(seed, tag.getBytes(ISO_8859_1)).take(8)
    val zeroIv = new Array[Byte](16)
    val upw = userPassword.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val opw = ownerPassword.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val u = SimplePdf.hash2B(upw, salt("uval"), Array.emptyByteArray) ++
      salt("uval") ++ salt("ukey")
    val ue = SimplePdf.aesNoPad(encrypt = true,
      SimplePdf.hash2B(upw, salt("ukey"), Array.emptyByteArray), zeroIv, fileKey)
    val o = SimplePdf.hash2B(opw, salt("oval"), u) ++ salt("oval") ++ salt("okey")
    val oe = SimplePdf.aesNoPad(encrypt = true,
      SimplePdf.hash2B(opw, salt("okey"), u), zeroIv, fileKey)
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02X").mkString
    def ivFor(objNum: Int): Array[Byte] =
      sha256(seed, s"iv$objNum".getBytes(ISO_8859_1)).take(16)

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
      val data = SimplePdf.aesEncrypt(fileKey, ivFor(contObj), plain)
      objs += s"$contObj 0 obj\n<< /Length ${data.length}$filter >>\nstream\n" +
        new String(data, ISO_8859_1) + "\nendstream\nendobj\n"
    }
    objs += s"$fontObj 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
    objs += s"$encObj 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O <${hex(o)}> /OE <${hex(oe)}> /U <${hex(u)}> /UE <${hex(ue)}> " +
      s"/P $perm >>\nendobj\n"

    val body = new StringBuilder("%PDF-2.0\n")
    val offsets = objs.map { ob => val off = body.length; body ++= ob; off }
    val xrefOff = body.length
    body ++= s"xref\n0 ${objs.length + 1}\n0000000000 65535 f \n"
    offsets.foreach(off => body ++= f"$off%010d 00000 n \n")
    body ++= s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R " +
      s"/Encrypt $encObj 0 R >>\nstartxref\n$xrefOff\n%%EOF\n"
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
