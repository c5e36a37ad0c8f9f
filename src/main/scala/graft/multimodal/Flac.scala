package graft.multimodal

/** Pure-JDK FLAC codec — the first TRANSFORM-FAMILY compressed audio
  * path (free-form bitstream, predictors + entropy coding) after the
  * sample-level codecs (G.711 companding, IMA ADPCM deltas). FLAC is
  * LOSSLESS, so unlike MP3/AAC the decode is exactly verifiable: the
  * round trip is bit-identical and the oracle replays sample sums in
  * closed form.
  *
  * Spec coverage (encoder + decoder are independent implementations of
  * the public format, https://xiph.org/flac/format.html):
  *  - fLaC magic, STREAMINFO metadata block (+ skip of any others)
  *  - frame headers: sync, UTF-8-coded frame number, blocksize /
  *    sample-rate / sample-size codes, CRC-8
  *  - channel assignments: independent (1..8), left/side, right/side,
  *    mid/side (decoder); encoder emits independent or mid/side,
  *    whichever is cheaper per frame
  *  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC (decoder),
  *    wasted-bits (decoder)
  *  - residuals: Rice methods 0 (4-bit params) and 1 (5-bit), escape
  *    partitions (5-bit raw width), any partition order (decoder;
  *    encoder emits order 0 with the exact-bit-minimizing parameter)
  *  - integrity: frame CRC-16 and the STREAMINFO MD5 of the decoded
  *    stream are both VERIFIED — a flipped byte anywhere fails decode
  *    rather than emitting wrong samples.
  *
  * Reference behavior anchor: the reference pipeline has no audio at
  * all (create_collections.py ingests PDFs only) — this is north-star
  * surface for the 100 TB multimodal story, where binary payload
  * columns ride parquet and decode runs scan-parallel per row.
  */
object Flac {

  // ---------------------------------------------------------------- bits

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L)
        nAcc += 1
        if (nAcc == 8) { out.write(acc.toInt & 0xff); acc = 0L; nAcc = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { writeBits(0L, q); writeBits(1L, 1) }
    def align(): Unit = if (nAcc != 0) writeBits(0L, 8 - nAcc)
    /** Valid only when byte-aligned. */
    def bytes: Array[Byte] = {
      require(nAcc == 0, "BitWriter.bytes on unaligned stream")
      out.toByteArray
    }
  }

  private final class BitReader(data: Array[Byte]) {
    private var bytePos = 0
    private var bitPos = 0 // 0..7, MSB first
    def position: Int = bytePos
    def aligned: Boolean = bitPos == 0
    def eof: Boolean = bytePos >= data.length
    def readBit(): Int = {
      val b = (data(bytePos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      (v << (64 - n) >> (64 - n)).toInt // sign-extend
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def readAlignedBytes(n: Int): Array[Byte] = {
      require(bitPos == 0); val a = java.util.Arrays.copyOfRange(data, bytePos, bytePos + n)
      bytePos += n; a
    }
  }

  // ---------------------------------------------------------------- crc

  private def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= data(i) & 0xff
      var b = 0
      while (b < 8) { crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff; b += 1 }
      i += 1
    }
    crc
  }

  private def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xff) << 8
      var b = 0
      while (b < 8) { crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff else (crc << 1) & 0xffff; b += 1 }
      i += 1
    }
    crc
  }

  // UTF-8-style coded number (frame index; the spec reuses UTF-8's
  // prefix scheme for values up to 36 bits).
  private def writeUtf8Number(w: BitWriter, v0: Long): Unit = {
    require(v0 >= 0)
    if (v0 < 0x80) w.writeBits(v0, 8)
    else {
      // capacity of an nBytes sequence = (7 - nBytes) + 6·(nBytes - 1) bits
      var nBytes = 2
      while (nBytes < 7 && v0 >= (1L << (7 - nBytes + 6 * (nBytes - 1)))) nBytes += 1
      // leading byte: nBytes ones, a zero, then the top payload bits
      w.writeBits((1L << nBytes) - 1, nBytes)
      w.writeBits(0L, 1)
      w.writeBits(v0 >>> (6 * (nBytes - 1)), 8 - nBytes - 1)
      var i = nBytes - 2
      while (i >= 0) { w.writeBits(0x2L, 2); w.writeBits((v0 >>> (6 * i)) & 0x3f, 6); i -= 1 }
    }
  }

  private def readUtf8Number(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    if ((first & 0x80) == 0) first.toLong
    else {
      var nBytes = 0
      var mask = 0x80
      while ((first & mask) != 0) { nBytes += 1; mask >>= 1 }
      require(nBytes >= 2 && nBytes <= 7, s"bad utf8 prefix $first")
      var v = (first & (0x7f >> nBytes)).toLong
      var i = 1
      while (i < nBytes) {
        val c = r.readBits(8).toInt
        require((c & 0xc0) == 0x80, "bad utf8 continuation")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      v
    }
  }

  // ---------------------------------------------------------------- model

  final case class FlacAudio(sampleRate: Int, channels: Int, bps: Int,
      frames: Long, samples: Array[Int]) // interleaved

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  // ---------------------------------------------------------------- encode

  private def zigzag(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63))

  /** Exact Rice cost in bits of this residual block at parameter k. */
  private def riceCost(res: Array[Int], from: Int, k: Int): Long = {
    var bits = 0L
    var i = from
    while (i < res.length) { bits += (zigzag(res(i)) >>> k) + k + 1; i += 1 }
    bits
  }

  /** Residuals of the order-o fixed predictor; res(i) valid for i >= o. */
  private def fixedResiduals(s: Array[Int], o: Int): Array[Int] = {
    val res = new Array[Int](s.length)
    val coefs = FixedCoefs(o)
    var i = o
    while (i < s.length) {
      var pred = 0L
      var j = 0
      while (j < o) { pred += coefs(j).toLong * s(i - 1 - j); j += 1 }
      res(i) = (s(i) - pred).toInt
      i += 1
    }
    res
  }

  /** One subframe: picks CONSTANT, else the Σ|residual|-best fixed order,
    * Rice-coded at the exact-bit-minimizing parameter (partition order 0;
    * method 0 when k ≤ 14, else method 1 — both decoder paths exercised).
    */
  private def writeSubframe(w: BitWriter, s: Array[Int], bps: Int): Unit = {
    val n = s.length
    var const = true
    var i = 1
    while (const && i < n) { if (s(i) != s(0)) const = false; i += 1 }
    if (const) {
      w.writeBits(0L, 1); w.writeBits(0L, 6); w.writeBits(0L, 1) // CONSTANT
      w.writeBits(s(0).toLong & ((1L << bps) - 1), bps)
      return
    }
    val maxOrder = math.min(4, n - 1)
    var bestO = 0
    var bestSum = Long.MaxValue
    var o = 0
    while (o <= maxOrder) {
      val res = fixedResiduals(s, o)
      var sum = 0L
      var j = o
      while (j < n) { sum += math.abs(res(j).toLong); j += 1 }
      if (sum < bestSum) { bestSum = sum; bestO = o }
      o += 1
    }
    val res = fixedResiduals(s, bestO)
    var bestK = 0
    var bestBits = Long.MaxValue
    var k = 0
    while (k <= 30) {
      val bits = riceCost(res, bestO, k)
      if (bits < bestBits) { bestBits = bits; bestK = k }
      k += 1
    }
    w.writeBits(0L, 1); w.writeBits(8L + bestO, 6); w.writeBits(0L, 1) // FIXED
    var j = 0
    while (j < bestO) { w.writeBits(s(j).toLong & ((1L << bps) - 1), bps); j += 1 }
    val method = if (bestK <= 14) 0 else 1
    val pBits = if (method == 0) 4 else 5
    w.writeBits(method.toLong, 2)
    w.writeBits(0L, 4) // partition order 0
    w.writeBits(bestK.toLong, pBits)
    j = bestO
    while (j < n) {
      val u = zigzag(res(j))
      w.writeUnary((u >>> bestK).toInt)
      if (bestK > 0) w.writeBits(u & ((1L << bestK) - 1), bestK)
      j += 1
    }
  }

  /** Encode 16-bit PCM to a genuine FLAC stream. `samples` interleaved
    * when channels == 2; stereo frames pick independent vs mid/side by
    * the cheaper Σ|residual| estimate.
    */
  def flacBytes(sampleRate: Int, channels: Int, samples: Array[Short],
      blockSize: Int = 1024): Array[Byte] = {
    require(channels == 1 || channels == 2, "flacBytes: mono or stereo only")
    require(samples.length % channels == 0)
    val frames = samples.length / channels
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val leBytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      leBytes(2 * i) = (samples(i) & 0xff).toByte
      leBytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val digest = md5.digest(leBytes)

    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    si.writeBits(1L, 1) // last metadata block
    si.writeBits(0L, 7) // STREAMINFO
    si.writeBits(34L, 24)
    si.writeBits(blockSize.toLong, 16) // min blocksize
    si.writeBits(blockSize.toLong, 16) // max blocksize
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits(15L, 5) // bps - 1
    si.writeBits(frames.toLong, 36)
    val siBytes = si.bytes
    out.write(siBytes)
    digest.foreach(b => out.write(b & 0xff))

    var frameIdx = 0L
    var pos = 0
    while (pos < frames) {
      val len = math.min(blockSize, frames - pos)
      val chans: Array[Array[Int]] = Array.tabulate(channels)(c =>
        Array.tabulate(len)(j => samples((pos + j) * channels + c).toInt))
      // stereo: mid/side when its residual mass is smaller
      var assign = channels - 1 // independent
      var enc = chans
      var encBps = Array.fill(channels)(16)
      if (channels == 2) {
        val left = chans(0); val right = chans(1)
        val mid = Array.tabulate(len)(j => (left(j) + right(j)) >> 1)
        val side = Array.tabulate(len)(j => left(j) - right(j))
        def mass(a: Array[Int]): Long = {
          val o = math.min(2, a.length - 1)
          val r = fixedResiduals(a, o)
          var s = 0L; var j = o
          while (j < a.length) { s += math.abs(r(j).toLong); j += 1 }
          s
        }
        if (mass(mid) + mass(side) < mass(left) + mass(right)) {
          assign = 10 // mid/side
          enc = Array(mid, side)
          encBps = Array(16, 17) // side channel carries one extra bit
        }
      }
      val w = new BitWriter
      w.writeBits(0x3ffeL, 14) // sync
      w.writeBits(0L, 1) // reserved
      w.writeBits(0L, 1) // fixed blocksize stream
      w.writeBits(7L, 4) // blocksize: 16-bit value - 1 follows header
      w.writeBits(0L, 4) // sample rate: from STREAMINFO
      w.writeBits(assign.toLong, 4)
      w.writeBits(4L, 3) // sample size: 16 bits
      w.writeBits(0L, 1) // reserved
      writeUtf8Number(w, frameIdx)
      w.writeBits((len - 1).toLong, 16)
      val headBytes = w.bytes
      w.writeBits(crc8(headBytes, 0, headBytes.length).toLong, 8)
      var c = 0
      while (c < enc.length) { writeSubframe(w, enc(c), encBps(c)); c += 1 }
      w.align()
      val frameBytes = w.bytes
      w.writeBits(crc16(frameBytes, 0, frameBytes.length).toLong, 16)
      out.write(w.bytes)
      frameIdx += 1
      pos += len
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Decode a FLAC stream. Verifies the magic, every frame's CRC-8 and
    * CRC-16, the STREAMINFO total-sample count, and (for 16-bit audio)
    * the STREAMINFO MD5 of the decoded stream — throws on any mismatch
    * rather than emitting silently-wrong samples.
    */
  def decode(payload: Array[Byte]): FlacAudio = {
    require(payload.length > 42 &&
      new String(payload, 0, 4, "US-ASCII") == "fLaC", "not a FLAC stream")
    val r = new BitReader(payload)
    r.readAlignedBytes(4)
    // metadata blocks
    var last = false
    var sampleRate = 0; var channels = 0; var bps = 0; var totalSamples = 0L
    var md5Expect: Array[Byte] = null
    while (!last) {
      last = r.readBits(1) == 1
      val btype = r.readBits(7).toInt
      val len = r.readBits(24).toInt
      if (btype == 0) {
        r.readBits(16); r.readBits(16) // min/max blocksize
        r.readBits(24); r.readBits(24) // min/max framesize
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bps = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        md5Expect = r.readAlignedBytes(16)
      } else r.readAlignedBytes(len)
    }
    require(sampleRate > 0 && channels > 0, "missing STREAMINFO")
    val outBuf = new java.util.ArrayList[Array[Int]]() // per-frame interleaved
    var decoded = 0L
    while (decoded < totalSamples && !r.eof) {
      val frameStart = r.position
      require(r.readBits(14) == 0x3ffeL, "lost frame sync")
      r.readBits(1) // reserved
      r.readBits(1) // blocking strategy
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val assign = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      r.readBits(1) // reserved
      readUtf8Number(r)
      val blockLen = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => throw new IllegalArgumentException("reserved blocksize code")
      }
      srCode match { // values beyond STREAMINFO ride the header tail
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case _ => ()
      }
      val frameBps = ssCode match {
        case 0 => bps
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => throw new IllegalArgumentException("reserved sample size")
      }
      require(r.aligned, "frame header must be byte-aligned before CRC-8")
      val crc8Expect = crc8(payload, frameStart, r.position)
      require(r.readBits(8).toInt == crc8Expect, "frame header CRC-8 mismatch")

      val nCh = if (assign <= 7) assign + 1 else 2
      require(nCh == channels, "frame channel count != STREAMINFO")
      val chans = new Array[Array[Int]](nCh)
      var c = 0
      while (c < nCh) {
        val chBps = frameBps + (assign match {
          case 8 => if (c == 1) 1 else 0  // left/side
          case 9 => if (c == 0) 1 else 0  // right/side
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        })
        chans(c) = readSubframe(r, blockLen, chBps)
        c += 1
      }
      r.alignToByte()
      val crc16Expect = crc16(payload, frameStart, r.position)
      require(r.readBits(16).toInt == crc16Expect, "frame CRC-16 mismatch")

      // undo stereo decorrelation
      val frame = assign match {
        case 8 => // left/side: right = left - side
          val l = chans(0); val s = chans(1)
          Array.tabulate(blockLen * 2)(i => if (i % 2 == 0) l(i / 2) else l(i / 2) - s(i / 2))
        case 9 => // right/side: left = right + side
          val s = chans(0); val rt = chans(1)
          Array.tabulate(blockLen * 2)(i => if (i % 2 == 0) rt(i / 2) + s(i / 2) else rt(i / 2))
        case 10 => // mid/side
          val m = chans(0); val s = chans(1)
          Array.tabulate(blockLen * 2) { i =>
            val mid2 = (m(i / 2) << 1) | (s(i / 2) & 1)
            if (i % 2 == 0) (mid2 + s(i / 2)) >> 1 else (mid2 - s(i / 2)) >> 1
          }
        case _ =>
          Array.tabulate(blockLen * nCh)(i => chans(i % nCh)(i / nCh))
      }
      outBuf.add(frame)
      decoded += blockLen
    }
    require(decoded == totalSamples,
      s"decoded $decoded frames, STREAMINFO says $totalSamples")
    var total = 0
    outBuf.forEach(f => total += f.length)
    val all = new Array[Int](total)
    var off = 0
    outBuf.forEach { f => System.arraycopy(f, 0, all, off, f.length); off += f.length }
    if (bps == 16 && md5Expect != null && md5Expect.exists(_ != 0)) {
      val md5 = java.security.MessageDigest.getInstance("MD5")
      val le = new Array[Byte](all.length * 2)
      var i = 0
      while (i < all.length) {
        le(2 * i) = (all(i) & 0xff).toByte
        le(2 * i + 1) = ((all(i) >> 8) & 0xff).toByte
        i += 1
      }
      require(java.util.Arrays.equals(md5.digest(le), md5Expect),
        "decoded-stream MD5 mismatch")
    }
    FlacAudio(sampleRate, channels, bps, totalSamples, all)
  }

  private def readSubframe(r: BitReader, blockLen: Int, bpsIn: Int): Array[Int] = {
    require(r.readBits(1) == 0, "subframe pad bit must be 0")
    val stype = r.readBits(6).toInt
    val wastedFlag = r.readBits(1).toInt
    val wasted = if (wastedFlag == 1) r.readUnary() + 1 else 0
    val bps = bpsIn - wasted
    val s = stype match {
      case 0 => // CONSTANT: a single stored value fills the block
        val v = r.readSigned(bps)
        Array.fill(blockLen)(v)
      case 1 => Array.tabulate(blockLen)(_ => r.readSigned(bps))
      case t if t >= 8 && t <= 12 =>
        val order = t - 8
        val s = new Array[Int](blockLen)
        var i = 0
        while (i < order) { s(i) = r.readSigned(bps); i += 1 }
        readResiduals(r, s, blockLen, order)
        val coefs = FixedCoefs(order)
        i = order
        while (i < blockLen) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += coefs(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = (s(i) + pred).toInt
          i += 1
        }
        s
      case t if t >= 32 =>
        val order = (t & 31) + 1
        val s = new Array[Int](blockLen)
        var i = 0
        while (i < order) { s(i) = r.readSigned(bps); i += 1 }
        val precision = r.readBits(4).toInt + 1
        require(precision <= 15, "invalid LPC precision")
        val shift = r.readSigned(5)
        require(shift >= 0, "negative LPC shift unsupported")
        val coefs = Array.tabulate(order)(_ => r.readSigned(precision))
        readResiduals(r, s, blockLen, order)
        i = order
        while (i < blockLen) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += coefs(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = (s(i) + (pred >> shift)).toInt
          i += 1
        }
        s
      case t => throw new IllegalArgumentException(s"reserved subframe type $t")
    }
    if (wasted > 0) { var i = 0; while (i < s.length) { s(i) = s(i) << wasted; i += 1 } }
    s
  }

  /** Rice-coded residuals written into s(order until blockLen). */
  private def readResiduals(r: BitReader, s: Array[Int], blockLen: Int,
      order: Int): Unit = {
    val method = r.readBits(2).toInt
    require(method <= 1, "reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val po = r.readBits(4).toInt
    val nPart = 1 << po
    require(blockLen % nPart == 0 && blockLen / nPart > order,
      "invalid partition order")
    var p = 0
    var idx = order
    while (p < nPart) {
      val count = blockLen / nPart - (if (p == 0) order else 0)
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) {
          s(idx) = if (raw == 0) 0 else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val u = (q << param) | (if (param > 0) r.readBits(param) else 0L)
          s(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // un-zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }
}
