package graft.ingest

import java.util.zip.Inflater

/** Pure-JDK PDF text extraction for the common machine-written subset —
  * the real implementation behind S4 (reference
  * `create_collections.py:29-53`, PyPDF2 `page.extract_text()`), which
  * was environment-blocked for external jars (no PDFBox in
  * /opt/spark/jars or the offline caches, re-checked every round).
  *
  * SUPPORTED (the subset virtually every text-first, generator-written
  * PDF uses): classic cross-reference tables AND PDF 1.5+ xref-stream
  * files (the parser scans `N G obj` spans directly and never needs
  * either xref form), OBJECT STREAMS (/Type /ObjStm — the compressed
  * dict containers modern generators put catalogs/pages in; expanded
  * via /N /First + the offset-pair header), page trees via /Pages
  * /Kids with document-order fallback, content streams raw,
  * /FlateDecode (java.util.zip.Inflater), or /LZWDecode (from-scratch
  * variable-width decoder incl. /EarlyChange 0) — either optionally
  * behind a /Predictor (TIFF 2 or PNG 10–15 per-row filters, undone
  * after decompression), text via Tj / ' / " / TJ
  * with literal `(...)` strings (all escapes + octal) and `<hex>`
  * strings, single-byte encodings read as Latin-1, AND Type0/CID
  * fonts with /ToUnicode remapping (per-page font resolution through
  * /Resources, `Tf` tracking in the content stream, 2-byte CID hex
  * strings mapped through the parsed bfchar/bfrange CMap — the layout
  * every modern unicode-text PDF uses).
  *
  * Encryption: the standard security handler with an EMPTY user
  * password is decrypted transparently at V 1 / R 2 (40-bit RC4),
  * V 2 (longer-key RC4), and V 4 / R 4 with /CFM /AESV2 (AES-128-CBC
  * via javax.crypto — the PDF 1.6 layout modern producers emit; the
  * 50-round rev-3+ key derivation, the sAlT per-object keys, and the
  * IV-prefixed PKCS#5 stream layout are all the spec's algorithms
  * 1–5), exercised end-to-end by the writer's own encrypted output.
  * V 5 / R 6 (/AESV3 — the PDF 2.0 handler) is supported INCLUDING
  * real non-empty user/owner passwords: the SHA-256/384/512 + AES
  * hardening loop (ISO 32000-2 Algorithm 2.B, [[hash2B]]), U/UE & O/OE
  * validation and file-key unwrap, one AES-256-CBC file key for every
  * stream. Pass the password via `extractPages(bytes, password)`; a
  * wrong/missing password degrades to Seq("").
  *
  * NOT supported, by documented choice: non-empty passwords at R ≤ 4
  * (real corpora that use passwords at all use R6 today) and CID text
  * in literal (non-hex) strings. A page that needs those yields "" —
  * the reference's own per-page failure placeholder semantics
  * (cc:41-47), keeping page numbering aligned.
  */
object SimplePdf {

  private val ObjRe =
    """(?s)(\d+)\s+\d+\s+obj\b(.*?)endobj""".r

  private final case class PdfObj(num: Int, dict: String, stream: Option[Array[Byte]])

  /** All `N G obj … endobj` spans. The byte array is viewed as
    * ISO-8859-1 so regex offsets are byte offsets (1 char == 1 byte).
    */
  private def parseObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    ObjRe.findAllMatchIn(s).flatMap { m =>
      val num = m.group(1).toInt
      val body = m.group(2)
      val streamIdx = body.indexOf("stream")
      if (streamIdx < 0) Some(PdfObj(num, body, None))
      else {
        val dict = body.substring(0, streamIdx)
        // stream data starts after "stream" + EOL; ends at "endstream"
        var dataStart = streamIdx + "stream".length
        if (dataStart < body.length && body.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < body.length && body.charAt(dataStart) == '\n') dataStart += 1
        val endIdx = body.lastIndexOf("endstream")
        if (endIdx < dataStart) Some(PdfObj(num, dict, None))
        else {
          val raw = body.substring(dataStart, endIdx)
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          Some(PdfObj(num, dict, Some(raw)))
        }
      }
    }.map(o => o.num -> o).toMap
  }

  /** RC4 (public algorithm; the cipher of the PDF 1.1–1.3 standard
    * security handler — symmetric, so it serves writer and reader).
    */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** The spec's 32-byte password padding string (PDF 32000, Alg. 2). */
  private[graft] val PadBytes: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def leInt(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Standard-security-handler file key for an EMPTY user password
    * (revision 2, 40-bit): MD5(pad ‖ O ‖ P-as-LE-int ‖ ID0)[0,5).
    */
  private[graft] def fileKey(o: Array[Byte], p: Int, id0: Array[Byte]): Array[Byte] =
    md5(PadBytes, o, leInt(p), id0).take(5)

  /** File key generalized to any revision (Alg. 2 in full): rev ≥ 3
    * adds the 50-round MD5 iteration over the first keyLen bytes.
    */
  private[graft] def fileKeyR(o: Array[Byte], p: Int, id0: Array[Byte],
      rev: Int, keyLen: Int): Array[Byte] = {
    var key = md5(PadBytes, o, leInt(p), id0)
    if (rev >= 3) for (_ <- 0 until 50) key = md5(key.take(keyLen))
    key.take(keyLen)
  }

  /** O entry for empty owner/user passwords (Alg. 3, rev 2):
    * RC4(MD5(pad)[0,5), pad).
    */
  private[graft] def ownerEntry(): Array[Byte] = rc4(md5(PadBytes).take(5), PadBytes)

  /** O entry at any revision (Alg. 3 in full): rev ≥ 3 iterates the
    * digest 50 times and applies the 19 extra RC4 passes with the key
    * XOR'd by the pass index.
    */
  private[graft] def ownerEntryR(rev: Int, keyLen: Int): Array[Byte] = {
    var ok = md5(PadBytes)
    if (rev >= 3) for (_ <- 0 until 50) ok = md5(ok)
    val k = ok.take(keyLen)
    var data = rc4(k, PadBytes)
    if (rev >= 3) for (i <- 1 to 19)
      data = rc4(k.map(b => (b ^ i).toByte), data)
    data
  }

  /** U entry for an empty user password (Alg. 4, rev 2): RC4(key, pad). */
  private[graft] def userEntry(key: Array[Byte]): Array[Byte] = rc4(key, PadBytes)

  /** U entry at rev ≥ 3 (Alg. 5): RC4 chain over MD5(pad ‖ ID0), 16
    * arbitrary (here zero) padding bytes appended; readers compare only
    * the first 16.
    */
  private[graft] def userEntryR(key: Array[Byte], id0: Array[Byte], rev: Int): Array[Byte] =
    if (rev <= 2) userEntry(key)
    else {
      var data = rc4(key, md5(PadBytes, id0))
      for (i <- 1 to 19) data = rc4(key.map(b => (b ^ i).toByte), data)
      data ++ new Array[Byte](16)
    }

  /** Per-object AES key (Alg. 1 with the AESV2 "sAlT" suffix). */
  private[graft] def objectKeyAes(key: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val salt = Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte,
      0x73.toByte, 0x41.toByte, 0x6C.toByte, 0x54.toByte)
    md5(key, salt).take(math.min(key.length + 5, 16))
  }

  /** AES-128-CBC with the AESV2 layout: a 16-byte IV prepended to the
    * PKCS#5-padded ciphertext — straight javax.crypto, pure JDK.
    */
  private[graft] def aesDecrypt(key: Array[Byte], ivAndData: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(ivAndData, 0, 16))
    // the marker-based stream slice keeps the EOL that precedes
    // "endstream"; ciphertext is whole blocks by construction, so
    // truncate to the block boundary (a real mis-slice still fails
    // the padding check)
    val n = ((ivAndData.length - 16) / 16) * 16
    c.doFinal(ivAndData, 16, n)
  }

  private[graft] def aesEncrypt(key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(data)
  }

  /** AES-CBC without padding — the R6 key-wrapping primitive (UE/OE
    * hold the 32-byte file key as exactly two blocks; Algorithm 2.B's
    * inner encryption is also unpadded).
    */
  private[graft] def aesNoPad(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** ISO 32000-2 Algorithm 2.B — the revision-6 password hash: an
    * iterated SHA-256/384/512 + AES-128-CBC hardening loop (≥ 64
    * rounds, data-dependent tail). Pure JDK: MessageDigest + Cipher.
    * `udata` is the 48-byte U string for owner-password hashes, empty
    * for user-password hashes.
    */
  private[graft] def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance(alg)
      parts.foreach(d.update)
      d.digest()
    }
    var k = sha("SHA-256", password, salt, udata)
    var e = Array.emptyByteArray
    var i = 0
    while (i < 64 || (e(e.length - 1) & 0xff) > i - 32) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      for (j <- 0 until 64) System.arraycopy(block, 0, k1, j * block.length, block.length)
      e = aesNoPad(encrypt = true, k.take(16), k.slice(16, 32), k1)
      val mod = (0 until 16).map(e(_) & 0xff).sum % 3
      k = sha(if (mod == 0) "SHA-256" else if (mod == 1) "SHA-384" else "SHA-512", e)
      i += 1
    }
    k.take(32)
  }

  /** R6 file key from the U/UE (user) or O/OE (owner) pair: validate
    * the password against the 32-byte verification hash, then unwrap
    * the 256-bit file key (AES-CBC, zero IV, no padding). Returns None
    * if the password matches neither role — the document degrades to
    * Seq(""), never garbage.
    */
  private[graft] def fileKeyR6(password: Array[Byte], u: Array[Byte], ue: Array[Byte],
      o: Array[Byte], oe: Array[Byte]): Option[Array[Byte]] = {
    val zeroIv = new Array[Byte](16)
    if (u.length >= 48 && ue.length == 32 &&
        hash2B(password, u.slice(32, 40), Array.emptyByteArray).sameElements(u.take(32)))
      Some(aesNoPad(encrypt = false,
        hash2B(password, u.slice(40, 48), Array.emptyByteArray), zeroIv, ue))
    else if (o.length >= 48 && oe.length == 32 && u.length >= 48 &&
        hash2B(password, o.slice(32, 40), u.take(48)).sameElements(o.take(32)))
      Some(aesNoPad(encrypt = false,
        hash2B(password, o.slice(40, 48), u.take(48)), zeroIv, oe))
    else None
  }

  /** Per-object key (Alg. 1): MD5(key ‖ objnum LE24 ‖ gen LE16) truncated
    * to min(keyLen+5, 16).
    */
  private[graft] def objectKey(key: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val salt = Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    md5(key, salt).take(math.min(key.length + 5, 16))
  }

  private final case class Enc(cipher: String, rev: Int, keyLen: Int,
      o: Array[Byte], p: Int, id0: Array[Byte],
      u: Array[Byte] = Array.emptyByteArray,
      ue: Array[Byte] = Array.emptyByteArray,
      oe: Array[Byte] = Array.emptyByteArray)

  /** Encryption parameters from the trailer for the standard security
    * handler: V 1 / R 2 (40-bit RC4), V 2 (longer-key RC4),
    * V 4 / R 4 with /CFM /AESV2 (AES-128-CBC) or /CFM /V2 (RC4-128),
    * and V 5 / R 6 with /CFM /AESV3 (AES-256, SHA-2 password hashing —
    * the PDF 2.0 handler). Unsupported handlers return None and the
    * document degrades to Seq("").
    */
  private def encryptionOf(s: String, objs: Map[Int, PdfObj]): Option[Enc] = {
    val ti = s.lastIndexOf("trailer")
    val region = if (ti >= 0) s.substring(ti) else s
    def hexEntry(dict: String, name: String): Option[Array[Byte]] =
      (name + """\s*<([0-9A-Fa-f]+)>""").r.findFirstMatchIn(dict)
        .map(m => hexBytes(m.group(1)))
    for {
      em <- """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(region)
      enc <- objs.get(em.group(1).toInt)
      if enc.dict.contains("/Standard")
      om <- hexEntry(enc.dict, "/O")
      pm <- """/P\s+(-?\d+)""".r.findFirstMatchIn(enc.dict)
      v = """/V\s+(\d+)""".r.findFirstMatchIn(enc.dict).map(_.group(1).toInt).getOrElse(1)
      r = """/R\s+(\d+)""".r.findFirstMatchIn(enc.dict).map(_.group(1).toInt).getOrElse(2)
      lenBits = """/Length\s+(\d+)""".r.findFirstMatchIn(enc.dict)
        .map(_.group(1).toInt).getOrElse(40)
      cipher <- v match {
        case 1 | 2 => Some("rc4")
        case 4 if enc.dict.contains("/AESV2") => Some("aes")
        case 4 if enc.dict.contains("/CFM") && enc.dict.contains("/V2") => Some("rc4")
        case 5 if enc.dict.contains("/AESV3") && r >= 5 => Some("aes256")
        case _ => None // other handlers: degrade, never emit garbage
      }
      // V5 has no /ID dependence; earlier revisions require it
      id0 <- if (cipher == "aes256") Some(Array.emptyByteArray)
        else """/ID\s*\[\s*<([0-9A-Fa-f]+)>""".r.findFirstMatchIn(region)
          .map(m => hexBytes(m.group(1)))
    } yield Enc(cipher, r, if (v == 1) 5 else math.max(5, lenBits / 8),
      om, pm.group(1).toInt, id0,
      u = hexEntry(enc.dict, "/U").getOrElse(Array.emptyByteArray),
      ue = hexEntry(enc.dict, "/UE").getOrElse(Array.emptyByteArray),
      oe = hexEntry(enc.dict, "/OE").getOrElse(Array.emptyByteArray))
  }

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return out.toByteArray // dict needed / stalled
      }
      out.toByteArray
    } finally inf.end()
  }

  /** PDF LZWDecode (spec 7.4.4 — the TIFF variant): MSB-first variable-
    * width codes, 9→12 bits, 256 = clear, 257 = EOD; `earlyChange`
    * (default 1) widens the code length one code early. The width
    * schedule is the standard nextCode-driven formula, applied
    * identically by [[SimplePdfWriter.lzwEncode]], so roundtrips stay in
    * sync across every boundary including dictionary-full reset
    * (SimplePdfSpec crosses all of them). Corrupt input degrades to the
    * bytes decoded so far — never a throw (the per-page "" discipline).
    */
  def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 3)
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def reset(): Unit = {
      table.clear()
      var i = 0
      while (i < 256) { table += Array(i.toByte); i += 1 }
      table += Array.emptyByteArray // 256 clear
      table += Array.emptyByteArray // 257 EOD
    }
    def widthFor(nextCode: Int): Int = {
      val n = nextCode + earlyChange
      if (n < 512) 9 else if (n < 1024) 10 else if (n < 2048) 11 else 12
    }
    reset()
    var width = 9
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var prev: Array[Byte] = null
    while (pos < data.length || bitCnt >= width) {
      while (bitCnt < width && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xff); bitCnt += 8; pos += 1
      }
      if (bitCnt < width) return out.toByteArray // truncated: degrade
      val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
      bitCnt -= width
      if (code == 256) { reset(); width = 9; prev = null }
      else if (code == 257) return out.toByteArray
      else {
        val entry: Array[Byte] =
          if (code < table.length) table(code)
          else if (code == table.length && prev != null) prev :+ prev(0) // KwKwK
          else return out.toByteArray // corrupt: degrade
        out.write(entry, 0, entry.length)
        if (prev != null && table.length < 4096) {
          table += (prev :+ entry(0))
          width = math.min(12, widthFor(table.length))
        }
        prev = entry
      }
    }
    out.toByteArray
  }

  /** Undo a /Predictor on decompressed stream data: 2 = TIFF horizontal
    * differencing (8-bit components), ≥ 10 = PNG per-row filters (each
    * row carries its filter byte: 0 None, 1 Sub, 2 Up, 3 Average,
    * 4 Paeth — RFC 2083 §6). Ragged trailing data is passed through
    * unfiltered rather than thrown on.
    */
  def undoPredictor(data: Array[Byte], predictor: Int,
      colors: Int, bpc: Int, columns: Int): Array[Byte] = {
    val bpp = math.max(1, colors * bpc / 8)
    if (predictor == 2) {
      if (bpc != 8) return data // unsupported depth: degrade
      val rowLen = columns * bpp
      val out = data.clone()
      var r = 0
      while ((r + 1) * rowLen <= out.length) {
        var i = r * rowLen + bpp
        while (i < (r + 1) * rowLen) {
          out(i) = (out(i) + out(i - bpp)).toByte; i += 1
        }
        r += 1
      }
      out
    } else if (predictor >= 10) {
      val rowLen = (columns * colors * bpc + 7) / 8
      val nRows = data.length / (rowLen + 1)
      val out = new Array[Byte](nRows * rowLen)
      val zero = new Array[Byte](rowLen)
      var priorStart = -1
      var r = 0
      while (r < nRows) {
        val src = r * (rowLen + 1)
        val ft = data(src) & 0xff
        val dst = r * rowLen
        def prior(i: Int): Int =
          if (priorStart < 0) 0 else out(priorStart + i) & 0xff
        var i = 0
        while (i < rowLen) {
          val x = data(src + 1 + i) & 0xff
          val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
          val up = prior(i)
          val ul = if (i >= bpp) prior(i - bpp) else 0
          val v = ft match {
            case 0 => x
            case 1 => x + left
            case 2 => x + up
            case 3 => x + (left + up) / 2
            case 4 => // Paeth
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => x
          }
          out(dst + i) = v.toByte
          i += 1
        }
        priorStart = dst
        r += 1
      }
      out
    } else data
  }

  private val PredictorRe = """/Predictor\s+(\d+)""".r
  private val ColumnsRe = """/Columns\s+(\d+)""".r
  private val ColorsRe = """/Colors\s+(\d+)""".r
  private val BpcRe = """/BitsPerComponent\s+(\d+)""".r
  private val EarlyChangeRe = """/EarlyChange\s+(\d+)""".r

  private def decodeStream(o: PdfObj): Option[String] =
    o.stream.map { raw =>
      var data =
        if (o.dict.contains("/FlateDecode")) inflate(raw)
        else if (o.dict.contains("/LZWDecode"))
          lzwDecode(raw, EarlyChangeRe.findFirstMatchIn(o.dict)
            .map(_.group(1).toInt).getOrElse(1))
        else raw
      val pred = PredictorRe.findFirstMatchIn(o.dict).map(_.group(1).toInt).getOrElse(1)
      if (pred > 1) {
        data = undoPredictor(data, pred,
          ColorsRe.findFirstMatchIn(o.dict).map(_.group(1).toInt).getOrElse(1),
          BpcRe.findFirstMatchIn(o.dict).map(_.group(1).toInt).getOrElse(8),
          ColumnsRe.findFirstMatchIn(o.dict).map(_.group(1).toInt).getOrElse(1))
      }
      new String(data, java.nio.charset.StandardCharsets.ISO_8859_1)
    }

  private val RefsRe = """(\d+)\s+\d+\s+R""".r

  private val ObjStmNRe = """/N\s+(\d+)""".r
  private val ObjStmFirstRe = """/First\s+(\d+)""".r

  /** Expand /Type /ObjStm object streams: the decoded stream opens with
    * N (objnum, offset) integer pairs, then the objects themselves
    * packed back-to-back from /First. Returns the embedded objects in
    * container-then-offset order; callers merge them UNDER the
    * top-level map (a top-level copy of the same number wins, matching
    * incremental-update precedence for the generator-written subset).
    */
  private def expandObjStms(objs: Map[Int, PdfObj]): Seq[PdfObj] = {
    val out = scala.collection.mutable.LinkedHashMap[Int, PdfObj]()
    objs.values.toSeq.sortBy(_.num).foreach { o =>
      if (o.dict.contains("/ObjStm")) {
        try {
          for {
            text <- decodeStream(o)
            nM <- ObjStmNRe.findFirstMatchIn(o.dict)
            fM <- ObjStmFirstRe.findFirstMatchIn(o.dict)
          } {
            val n = nM.group(1).toInt
            val first = fM.group(1).toInt
            if (first > 0 && first <= text.length) {
              val nums = """\d+""".r.findAllIn(text.substring(0, first))
                .map(_.toInt).take(2 * n).toSeq
              if (nums.length == 2 * n) {
                val pairs = nums.grouped(2).map(p => (p(0), p(1))).toSeq
                pairs.zipWithIndex.foreach { case ((objNum, off), idx) =>
                  val start = first + off
                  val end =
                    if (idx + 1 < pairs.length) first + pairs(idx + 1)._2
                    else text.length
                  if (start >= first && start <= end && end <= text.length)
                    out.getOrElseUpdate(objNum,
                      PdfObj(objNum, text.substring(start, end), None))
                }
              }
            }
          }
        } catch { case _: Throwable => () } // a bad ObjStm degrades, per-page "" downstream
      }
    }
    out.values.toSeq
  }

  /** Page object numbers in /Pages-tree order (DFS over /Kids), falling
    * back to document order for any /Type /Page not reachable from a
    * tree root.
    */
  private def pageOrder(objs: Map[Int, PdfObj], docOrder: Seq[Int]): Seq[Int] = {
    val isPage = (n: Int) => objs.get(n).exists(o =>
      o.dict.contains("/Page") && !o.dict.contains("/Pages"))
    val kids = (n: Int) => objs.get(n).toSeq.flatMap { o =>
      val k = o.dict.indexOf("/Kids")
      if (k < 0) Seq.empty
      else RefsRe.findAllMatchIn(o.dict.substring(k)).map(_.group(1).toInt).toSeq
    }
    val roots = docOrder.filter(n => objs(n).dict.contains("/Pages"))
    val seen = scala.collection.mutable.LinkedHashSet[Int]()
    def dfs(n: Int): Unit =
      if (isPage(n)) { seen += n } else kids(n).foreach(dfs)
    roots.foreach(dfs)
    docOrder.filter(isPage).foreach(seen += _) // unreachable pages, doc order
    seen.toSeq
  }

  /** Parse a /ToUnicode CMap: `beginbfchar` pairs and `beginbfrange`
    * triples (simple <lo> <hi> <dstStart> form), hex values decoded as
    * UTF-16BE. Returns CID → unicode string.
    */
  private[graft] def parseCMap(text: String): Map[Int, String] = {
    val out = scala.collection.mutable.HashMap[Int, String]()
    def hexInt(h: String): Int = Integer.parseInt(h, 16)
    def hexStr(h: String): String = {
      val codes = h.grouped(4).filter(_.length == 4).map(hexInt(_).toChar)
      new String(codes.toArray)
    }
    val BfChar = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    val BfRange = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
    def blocks(begin: String, end: String): Iterator[String] = {
      val B = java.util.regex.Pattern.quote(begin)
      val E = java.util.regex.Pattern.quote(end)
      s"(?s)$B(.*?)$E".r.findAllMatchIn(text).map(_.group(1))
    }
    blocks("beginbfrange", "endbfrange").foreach { blk =>
      BfRange.findAllMatchIn(blk).foreach { m =>
        val (lo, hi, dst) = (hexInt(m.group(1)), hexInt(m.group(2)), hexInt(m.group(3)))
        var c = lo
        while (c <= hi && c - lo <= 0xFFFF) { out(c) = (dst + (c - lo)).toChar.toString; c += 1 }
      }
    }
    blocks("beginbfchar", "endbfchar").foreach { blk =>
      BfChar.findAllMatchIn(blk).foreach { m =>
        out(hexInt(m.group(1))) = hexStr(m.group(2))
      }
    }
    out.toMap
  }

  /** Font-name → ToUnicode CMap for a page: walk /Resources (inline or
    * referenced) → /Font name/ref pairs → Type0 fonts carrying a
    * /ToUnicode stream. Fonts without a CMap are absent (hex strings
    * for them keep the single-byte Latin-1 path).
    */
  private def fontCMaps(objs: Map[Int, PdfObj], pageDict: String): Map[String, Map[Int, String]] = {
    val ri = pageDict.indexOf("/Resources")
    if (ri < 0) return Map.empty
    val after = pageDict.substring(ri + "/Resources".length)
    val resText = """^\s*(\d+)\s+\d+\s+R""".r.findFirstMatchIn(after) match {
      case Some(m) => objs.get(m.group(1).toInt).map(_.dict).getOrElse("")
      case None => after
    }
    val fi = resText.indexOf("/Font")
    if (fi < 0) return Map.empty
    val fontRegion = resText.substring(fi)
    """/(\w+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fontRegion).flatMap { m =>
      val name = m.group(1)
      objs.get(m.group(2).toInt).flatMap { font =>
        if (!font.dict.contains("/Type0")) None
        else {
          val ti = font.dict.indexOf("/ToUnicode")
          if (ti < 0) None
          else RefsRe.findFirstMatchIn(font.dict.substring(ti)).flatMap { r =>
            objs.get(r.group(1).toInt).flatMap(decodeStream).map(parseCMap)
          }.filter(_.nonEmpty).map(name -> _)
        }
      }
    }.toMap
  }

  /** Text-showing extraction from one decoded content stream: a
    * sequential tokenizer that collects `(…)`/`<…>` strings and flushes
    * them on Tj / ' / " / TJ; Td, TD, T* and ET insert line breaks.
    * `fonts` carries per-name ToUnicode CMaps: after `/Fn size Tf`
    * selects a CID font, hex strings are decoded as 2-byte CIDs mapped
    * through its CMap (unmapped CIDs are dropped — the degrade-silently
    * contract); other fonts keep the single-byte Latin-1 path.
    */
  private[ingest] def textFromContent(content: String,
      fonts: Map[String, Map[Int, String]]): String = {
    val out = new StringBuilder
    val pending = new StringBuilder
    var i = 0
    val n = content.length
    var lastName = ""
    var cidMap: Option[Map[Int, String]] = None
    def readLiteral(): Unit = { // at '(' — balanced with escapes
      var depth = 1
      i += 1
      while (i < n && depth > 0) {
        content.charAt(i) match {
          case '\\' if i + 1 < n =>
            content.charAt(i + 1) match {
              case 'n' => pending += '\n'; i += 2
              case 'r' => pending += '\r'; i += 2
              case 't' => pending += '\t'; i += 2
              case 'b' => pending += '\b'; i += 2
              case 'f' => pending += '\f'; i += 2
              case c @ ('(' | ')' | '\\') => pending += c; i += 2
              case d if d >= '0' && d <= '7' => // octal, up to 3 digits
                var j = i + 1; var v = 0
                while (j < n && j < i + 4 && content.charAt(j) >= '0' && content.charAt(j) <= '7') {
                  v = v * 8 + (content.charAt(j) - '0'); j += 1
                }
                pending += v.toChar; i = j
              case _ => i += 2 // line continuation etc.
            }
          case '(' => depth += 1; pending += '('; i += 1
          case ')' =>
            depth -= 1; if (depth > 0) pending += ')'
            i += 1
          case c => pending += c; i += 1
        }
      }
    }
    def readHex(): Unit = { // at '<' (single, not '<<')
      i += 1
      val hex = new StringBuilder
      while (i < n && content.charAt(i) != '>') {
        val c = content.charAt(i)
        if (Character.digit(c, 16) >= 0) hex += c
        i += 1
      }
      i += 1 // '>'
      cidMap match {
        case Some(map) =>
          // CID font: 2-byte codes, odd tails zero-padded per spec
          val h = hex.toString.padTo((hex.length + 3) / 4 * 4, '0')
          var j = 0
          while (j + 4 <= h.length) {
            map.get(Integer.parseInt(h.substring(j, j + 4), 16))
              .foreach(pending ++= _)
            j += 4
          }
        case None =>
          val h = if (hex.length % 2 == 1) hex.append('0') else hex
          var j = 0
          while (j + 2 <= h.length) {
            pending += Integer.parseInt(h.substring(j, j + 2), 16).toChar
            j += 2
          }
      }
    }
    def flushShow(): Unit = { out ++= pending; pending.clear() }
    def dropPending(): Unit = pending.clear()
    while (i < n) {
      content.charAt(i) match {
        case '(' => readLiteral()
        case '<' if i + 1 < n && content.charAt(i + 1) == '<' => i += 2
        case '<' => readHex()
        case '[' | ']' => i += 1 // TJ arrays: strings inside already collected
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          val start = i
          while (i < n && !content.charAt(i).isWhitespace &&
            !"()<>[]/".contains(content.charAt(i))) i += 1
          content.substring(start, i) match {
            case "Tj" | "TJ" => flushShow()
            case "'" => out += '\n'; flushShow()
            case "\"" => out += '\n'; flushShow()
            case "Td" | "TD" | "T*" => if (out.nonEmpty) out += '\n'
            case "ET" => if (out.nonEmpty && out.last != '\n') out += '\n'
            case "Tf" => // font select: the last name token picks the CMap
              cidMap = fonts.get(lastName)
              dropPending()
            case "BI" => // inline image: skip to EI
              val ei = content.indexOf("EI", i)
              i = if (ei < 0) n else ei + 2
              dropPending()
            case _ => dropPending() // string was an operand of a non-show op
          }
        case '/' => // name token: consume so names never look like ops
          i += 1
          val nameStart = i
          while (i < n && !content.charAt(i).isWhitespace &&
            !"()<>[]/".contains(content.charAt(i))) i += 1
          lastName = content.substring(nameStart, i)
        case _ => i += 1
      }
    }
    out.toString
  }

  /** All pages' text, reference placeholder semantics: unparseable page
    * → "" at its index; unparseable document → Seq("").
    */
  def extractPages(bytes: Array[Byte]): Seq[String] = extractPages(bytes, "")

  /** As [[extractPages]], with a password for protected documents (R6
    * accepts either the user or the owner password; earlier revisions
    * keep the empty-user-password path).
    */
  def extractPages(bytes: Array[Byte], password: String): Seq[String] =
    try {
      val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      if (!s.startsWith("%PDF")) return Seq("")
      val parsed = parseObjects(bytes)
      // standard-security-handler decryption: every object stream is
      // deciphered under its key before any other processing — Flate,
      // ObjStm expansion, and CMaps then see plaintext exactly as in an
      // unencrypted file. V≤4 derives per-object keys from the MD5 file
      // key; V5/R6 (AESV3) uses ONE 256-bit file key unwrapped from
      // U/UE (or O/OE) after the SHA-2 password hash validates.
      val topLevel = encryptionOf(s, parsed) match {
        case Some(enc) if enc.cipher == "aes256" =>
          fileKeyR6(password.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            enc.u, enc.ue, enc.o, enc.oe) match {
            case Some(fk) =>
              parsed.map { case (num, obj) =>
                num -> obj.copy(stream = obj.stream.map(raw => aesDecrypt(fk, raw)))
              }
            case None => return Seq("") // wrong password: degrade
          }
        case Some(enc) =>
          val key = fileKeyR(enc.o, enc.p, enc.id0, enc.rev, enc.keyLen)
          parsed.map { case (num, obj) =>
            num -> obj.copy(stream = obj.stream.map { raw =>
              if (enc.cipher == "aes") aesDecrypt(objectKeyAes(key, num, 0), raw)
              else rc4(objectKey(key, num, 0), raw)
            })
          }
        case None => parsed
      }
      val embedded = expandObjStms(topLevel)
      val objs = embedded.map(o => o.num -> o).toMap ++ topLevel
      val docOrder = {
        val seen = scala.collection.mutable.LinkedHashSet[Int]()
        ObjRe.findAllMatchIn(s).foreach(m => seen += m.group(1).toInt)
        embedded.foreach(seen += _.num)
        seen.toSeq
      }
      val pages = pageOrder(objs, docOrder)
      if (pages.isEmpty) return Seq("")
      pages.map { p =>
        try {
          val dict = objs(p).dict
          val ci = dict.indexOf("/Contents")
          if (ci < 0) ""
          else {
            val cmaps = try fontCMaps(objs, dict) catch { case _: Throwable => Map.empty[String, Map[Int, String]] }
            val contentRefs = RefsRe.findAllMatchIn(dict.substring(ci)).map(_.group(1).toInt).toSeq
            val text = contentRefs.flatMap(r => objs.get(r).flatMap(decodeStream))
              .map(textFromContent(_, cmaps)).mkString("\n")
            text.replaceAll("[ \\t]+\\n", "\n").trim
          }
        } catch { case _: Throwable => "" }
      }
    } catch { case _: Throwable => Seq("") }
}

/** [[PageExtractor]] backed by [[SimplePdf]] — drop-in for
  * [[PdfIngest.ingestDirectory]] on real .pdf payloads.
  */
object SimplePdfExtractor extends PageExtractor {
  def extractPages(fileName: String, payload: Array[Byte]): Seq[String] =
    SimplePdf.extractPages(payload)
}
