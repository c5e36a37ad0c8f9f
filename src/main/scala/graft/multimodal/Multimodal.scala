package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition transforms.
  *
  * IMAGE decode and resize are REAL for JDK-supported formats
  * (PNG/BMP/GIF/JPEG via javax.imageio + headless AWT — zero new
  * dependencies; see [[decodeImages]]/[[resizeImages]], proven on real
  * PNG bytes in MultimodalSpec). AUDIO decode is REAL for PCM WAV
  * ([[decodeWav]] — RIFF walking + int16 samples are pure JDK,
  * cross-checked against javax.sound's own reader and oracle-checked
  * via `multimodal_audio_stats`) AND for the COMPRESSED codecs a JVM
  * speaks without a native library: G.711 μ-law/A-law 2:1 companding
  * ([[G711]], oracle-checked via `multimodal_audio_g711`) and IMA
  * ADPCM 4:1 ([[ImaAdpcm]], oracle-checked via
  * `multimodal_audio_adpcm`). VIDEO decode is REAL for
  * uncompressed-DIB AVI ([[decodeAvi]] — RIFF/LIST container walking +
  * raw BGR frames, oracle-checked via `multimodal_video_frames`), for
  * MJPEG-in-AVI (per-frame JPEG through the JDK's own codec,
  * oracle-checked via `multimodal_video_mjpeg`), for MS-RLE8
  * (`multimodal_video_rle` — own opcode walker) INCLUDING
  * INTER-FRAME delta frames whose pixels carry across frames
  * (`multimodal_video_delta`), and for MS VIDEO 1 — the lossy
  * vector-quantization family, own opcode walker + persistent buffer
  * (`multimodal_video_msv1`). The lossy TRANSFORM family's core (8×8
  * DCT-II + JPEG-table quantization) is implemented from scratch with
  * bit-replayable loss accounting (`multimodal_dct_block` in
  * SparkEntry); only FULL MP3/AAC/H.264 bitstreams remain STUBBED —
  * entropy coding + spec scale genuinely need a native library (see
  * [[DecodeStub]]). MPEG-1 Audio Layer I/II was evaluated as the next
  * rung (r13 verdict) and deliberately NOT built: its polyphase
  * filterbank is defined by ISO 11172-3 Table B.3 — 512 empirical
  * window coefficients with no closed form — which this offline
  * environment does not carry; shipping a lookalike filterbank under
  * the MPEG name would be dishonest, so the family stays on the stub
  * list with this reason;
  * everything Spark-side is real either way: schema, binary column
  * handling, partition-batched UDF shape, and the metadata extraction
  * that IS engine-portable (sizes, digests, magic bytes). At 100 TB
  * the payloads live in parquet binary columns (or object-store paths)
  * and the per-partition transform is the unit of parallelism —
  * identical plumbing to what mapInPandas does in PySpark.
  */
object Multimodal {

  /** ImageIO defaults to a DISK-backed stream cache — one temp file per
    * encode/decode call, which dominates runtime for small images (the
    * pixel work is microseconds; the file create/delete is not). All
    * payloads here are in-memory byte arrays, so the memory cache is
    * strictly better. Executor-side JVM-global, idempotent.
    */
  def disableImageIoDiskCache(): Unit = javax.imageio.ImageIO.setUseCache(false)

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

  /** Frame sampling — the video-frame-extraction shape: every `stride`
    * bytes, take a `frameLen`-byte frame. One row per (id, frame_idx,
    * frame payload + digest), produced by pure built-ins (sequence →
    * transform → posexplode): narrow, codegen'd, zero shuffle — the
    * decode of each frame then rides [[extractFeatures]]'s batched path.
    */
  def frameSample(media: DataFrame, stride: Int, frameLen: Int): DataFrame = {
    require(stride > 0 && frameLen > 0, "stride and frameLen must be positive")
    media
      // empty payload -> 0 frames; the guard matters because
      // sequence(0, -1) counts DOWN instead of producing an empty array
      .withColumn("n_frames", expr(
        s"case when octet_length(payload) = 0 then 0 else (octet_length(payload) - 1) div $stride + 1 end"))
      .withColumn("frames",
        when(col("n_frames") === 0, expr("cast(array() as array<binary>)"))
          .otherwise(expr(
            s"transform(sequence(0, int(n_frames) - 1), i -> substring(payload, i * $stride + 1, $frameLen))")))
      .select(col("id"), col("n_frames"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .withColumn("frame_md5", md5(col("frame")))
  }

  final case class ImageInfo(
      id: Long, is_image: Boolean, width: Int, height: Int, mean_rgb: Array[Float])

  /** REAL image decode for JDK-supported formats (PNG / BMP / GIF /
    * JPEG via javax.imageio — zero new dependencies; the same
    * headless-JDK contract ChartSink already relies on). Emits
    * dimensions plus a mean-RGB feature vector; a payload ImageIO
    * cannot parse (including every text-derived fixture payload)
    * degrades to is_image = false with empty features instead of
    * failing the partition — the per-row error-capture contract the
    * ingest path (S2) uses. Batched per partition like every other
    * media transform; a native decoder for formats the JDK lacks slots
    * into the same signature.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageInfo] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { r =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            if (img == null) ImageInfo(r.id, is_image = false, 0, 0, Array.empty)
            else {
              // Bulk row reads: one getRGB call per ROW into a reused
              // buffer, not one per pixel — same ARGB int per pixel
              // (identical mean values), ~width× fewer raster-accessor
              // crossings on the hot path.
              val w = img.getWidth
              val h = img.getHeight
              val row = new Array[Int](w)
              var (sr, sg, sb) = (0L, 0L, 0L)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, row, 0, w)
                var x = 0
                while (x < w) {
                  val rgb = row(x)
                  sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              val n = (w.toLong * h).max(1L).toFloat
              ImageInfo(r.id, is_image = true, w, h, Array(sr / n, sg / n, sb / n))
            }
          } catch {
            case _: Exception => ImageInfo(r.id, is_image = false, 0, 0, Array.empty)
          }
        }
      }
  }

  /** Single-pixel-per-cell grayscale PNG writer (r = g = b = gray) —
    * the generator half of the perceptual-hash fixture, same
    * generate-then-decode discipline as the WAV/AVI/PDF paths. PNG is
    * lossless, so decoded pixels equal `grays` exactly.
    */
  def grayPngBytes(w: Int, h: Int, grays: Array[Int]): Array[Byte] = {
    require(grays.length == w * h)
    disableImageIoDiskCache()
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    while (i < grays.length) {
      val v = grays(i) & 0xff
      img.setRGB(i % w, i / w, (v << 16) | (v << 8) | v)
      i += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  final case class DHashInfo(id: Long, is_image: Boolean, dhash: Long)

  /** Perceptual difference-hash (dHash) over REAL decoded images: the
    * image is box-averaged onto a 9×8 luminance grid (exact integer
    * math — floor of the block mean of (r+g+b)/3; identity for 9×8
    * inputs, so fixtures replay in closed form) and bit r·8+c is set
    * iff grid(r,c) > grid(r,c+1). Gradient signs are invariant to
    * global brightness shifts — the "perceptual" part — and the 64-bit
    * signature feeds the same banded Hamming join as SimHash
    * (Dedup.dhashPairs). Scan-parallel per row; non-images degrade to
    * is_image = false.
    */
  def dHash64(spark: SparkSession, media: DataFrame): Dataset[DHashInfo] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { r =>
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
            if (img == null) DHashInfo(r.id, is_image = false, 0L)
            else {
              val w = img.getWidth
              val h = img.getHeight
              require(w >= 9 && h >= 8, "dHash needs at least 9x8 pixels")
              val grid = Array.ofDim[Long](8, 9)
              val row = new Array[Int](w)
              // exact integer box average: cell (gr,gc) covers source
              // rows [gr·h/8,(gr+1)·h/8) × cols [gc·w/9,(gc+1)·w/9)
              val counts = Array.ofDim[Long](8, 9)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, row, 0, w)
                val gr = y * 8 / h
                var x = 0
                while (x < w) {
                  val rgb = row(x)
                  val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                  val gc = x * 9 / w
                  grid(gr)(gc) += lum
                  counts(gr)(gc) += 1
                  x += 1
                }
                y += 1
              }
              var hash = 0L
              var gr = 0
              while (gr < 8) {
                var gc = 0
                while (gc < 8) {
                  val a = grid(gr)(gc) / counts(gr)(gc)
                  val b = grid(gr)(gc + 1) / counts(gr)(gc + 1)
                  if (a > b) hash |= 1L << (gr * 8 + gc)
                  gc += 1
                }
                gr += 1
              }
              DHashInfo(r.id, is_image = true, hash)
            }
          } catch {
            case _: Exception => DHashInfo(r.id, is_image = false, 0L)
          }
        }
      }
  }

  final case class AudioInfo(id: Long, is_audio: Boolean, codec: String,
      sample_rate: Int, channels: Int, n_samples: Long, duration_ms: Double,
      rms: Double, first_sample: Int)

  /** ITU-T G.711 companding (μ-law / A-law) — logarithmic 2:1 audio
    * compression, written algorithmically from the public standard
    * (segment + mantissa form; same arithmetic as the classic Sun
    * g711.c reference implementation everyone ships). Pure integer
    * functions, so encode/decode are exactly deterministic; the decode
    * side is additionally cross-checked against javax.sound's own
    * ULAW/ALAW converter in MultimodalSpec. The quantization levels are
    * the decode values — samples ON a level round-trip exactly, which
    * is what the `multimodal_audio_g711` fixture exploits for its
    * closed-form oracle.
    */
  object G711 {
    def ulawEncode(s: Short): Byte = {
      var x = s.toInt >> 2 // 16-bit → 14-bit domain
      val sign = if (x < 0) { x = -x; 0x80 } else 0
      if (x > 8159) x = 8159
      x += 33 // x in [33, 8192]
      if (x > 0x1FFF) (~(sign | 0x7F)).toByte // clip escapes to max codeword
      else {
        var seg = 0
        var t = x >> 6
        while (t != 0) { seg += 1; t >>= 1 }
        val mant = (x >> (seg + 1)) & 0xF
        (~(sign | (seg << 4) | mant)).toByte
      }
    }

    def ulawDecode(b: Byte): Short = {
      val u = (~b) & 0xFF
      val seg = (u >> 4) & 7
      val mant = u & 0xF
      val t = (((mant << 3) + 0x84) << seg) - 0x84
      (if ((u & 0x80) != 0) -t else t).toShort
    }

    def alawEncode(s: Short): Byte = {
      var x = s.toInt >> 3 // 16-bit → 13-bit domain
      val mask = if (x >= 0) 0xD5 else { x = -x - 1; 0x55 }
      var seg = 0
      var t = x >> 5
      while (t != 0 && seg < 8) { seg += 1; t >>= 1 }
      if (seg >= 8) (0x7F ^ mask).toByte
      else {
        val mant = if (seg < 2) (x >> 1) & 0xF else (x >> seg) & 0xF
        (((seg << 4) | mant) ^ mask).toByte
      }
    }

    def alawDecode(b: Byte): Short = {
      val a = (b ^ 0x55) & 0xFF
      val seg = (a >> 4) & 7
      var t = ((a & 0xF) << 4) + 8
      if (seg > 0) t = (t + 0x100) << (seg - 1)
      (if ((a & 0x80) != 0) t else -t).toShort
    }
  }

  /** IMA/DVI ADPCM (the 4-bit adaptive-delta codec of WAVE format 17) —
    * written from the public IMA spec: an 89-entry step-size table, a
    * 16-entry index-adaptation table, and a per-nibble predictor
    * update. 4:1 compression, pure integer state machine (bit-exact on
    * every platform). Block layout is the standard WAV one: 4-byte
    * header (predictor int16, step index, reserved) carrying the FIRST
    * sample exactly, then two samples per byte (low nibble first).
    */
  object ImaAdpcm {
    val stepTable: Array[Int] = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
      41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
      190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
      724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
      2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
      6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
      16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
    val indexTable: Array[Int] =
      Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

    final class State(var pred: Int, var index: Int) {
      private def clampIndex(): Unit =
        index = math.min(math.max(index, 0), 88)
      private def clampPred(): Unit =
        pred = math.min(math.max(pred, -32768), 32767)

      /** Apply one nibble; returns the reconstructed sample. */
      def decodeNibble(n: Int): Int = {
        val step = stepTable(index)
        var diff = step >> 3
        if ((n & 4) != 0) diff += step
        if ((n & 2) != 0) diff += step >> 1
        if ((n & 1) != 0) diff += step >> 2
        if ((n & 8) != 0) pred -= diff else pred += diff
        clampPred()
        index += indexTable(n)
        clampIndex()
        pred
      }

      /** Quantize one sample to a nibble AND advance the state through
        * the decoder's own update (encoder mirrors decoder — the IMA
        * discipline that keeps the two in lockstep).
        */
      def encodeSample(s: Int): Int = {
        val step = stepTable(index)
        var diff = s - pred
        var n = 0
        if (diff < 0) { n = 8; diff = -diff }
        if (diff >= step) { n |= 4; diff -= step }
        if (diff >= (step >> 1)) { n |= 2; diff -= step >> 1 }
        if (diff >= (step >> 2)) n |= 1
        decodeNibble(n)
        n
      }
    }
  }

  /** Minimal RIFF/WAVE writer: 16-bit PCM little-endian — a genuine WAV
    * any player (or the JDK's own AudioSystem, cross-checked in
    * MultimodalSpec) reads. The generator half of the audio story, the
    * same generate-then-decode discipline as the PNG and PDF paths.
    */
  def wavBytes(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** RIFF/WAVE writer for G.711-companded audio (audioFormat 7 = μ-law,
    * 6 = A-law; 8 bits per sample — genuine 2:1 compressed WAV any
    * player and javax.sound read). Same fixture discipline as
    * [[wavBytes]]: generate-then-decode.
    */
  def wavBytesG711(sampleRate: Int, channels: Int, samples: Array[Short],
      aLaw: Boolean): Array[Byte] = {
    val enc: Short => Byte = if (aLaw) G711.alawEncode else G711.ulawEncode
    val fmt = if (aLaw) 6 else 7
    val dataLen = samples.length
    val pad = dataLen & 1
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen + pad)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmt.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels).putShort(channels.toShort).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.put(enc(s)))
    bb.array()
  }

  /** RIFF/WAVE writer for IMA ADPCM (audioFormat 17, mono, 4 bits per
    * sample — genuine 4:1 compressed WAV). Standard layout: extended
    * fmt chunk (cbSize = 2, samplesPerBlock), a `fact` chunk with the
    * exact total sample count (mandatory for compressed WAV — the
    * decoder's stop condition), and fixed-size data blocks whose 4-byte
    * header carries the block's first sample verbatim plus the carried
    * step index. `samplesPerBlock` must be odd so nibbles pack evenly.
    */
  def wavBytesImaAdpcm(sampleRate: Int, samples: Array[Short],
      samplesPerBlock: Int = 505): Array[Byte] = {
    require(samplesPerBlock > 1 && samplesPerBlock % 2 == 1,
      "samplesPerBlock must be odd and > 1")
    val blockAlign = 4 + (samplesPerBlock - 1) / 2
    val nBlocks = (samples.length + samplesPerBlock - 1) / samplesPerBlock
    val dataLen = nBlocks * blockAlign
    val bb = java.nio.ByteBuffer.allocate(48 + 12 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(40 + 12 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(17).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / samplesPerBlock)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(samplesPerBlock.toShort)
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(samples.length)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    val st = new ImaAdpcm.State(0, 0)
    var b = 0
    while (b < nBlocks) {
      val from = b * samplesPerBlock
      val until = math.min(samples.length, from + samplesPerBlock)
      st.pred = samples(from).toInt // first sample rides the header exactly
      bb.putShort(st.pred.toShort).put(st.index.toByte).put(0.toByte)
      var i = from + 1
      def nib(): Int =
        if (i < until) { val n = st.encodeSample(samples(i).toInt); i += 1; n }
        else 0
      var written = 0
      while (written < (samplesPerBlock - 1) / 2) {
        val lo = nib(); val hi = nib()
        bb.put(((hi << 4) | lo).toByte)
        written += 1
      }
      b += 1
    }
    bb.array()
  }

  /** REAL audio decode for WAV — PCM int16 (format 1) AND the
    * compressed codecs a JVM can speak without a native library:
    * G.711 μ-law/A-law (formats 7/6, [[G711]]) and IMA ADPCM
    * (format 17, [[ImaAdpcm]]); only transform codecs (MP3/AAC) remain
    * out of scope. RIFF chunk walking is shared; the fmt tag selects
    * the sample decoder. Emits format fields, the codec tag, the FIRST
    * decoded sample (exact for every codec here — G.711 levels and the
    * ADPCM block header are lossless at sample 0), and exact-integer
    * RMS over the DECODED samples (Σs² is an exact long; one sqrt at
    * the end). Non-WAV payloads degrade to is_audio = false — the
    * decodeImages contract.
    */
  def decodeWav(spark: SparkSession, media: DataFrame): Dataset[AudioInfo] = {
    import spark.implicits._
    val none = (id: Long) => AudioInfo(id, is_audio = false, "", 0, 0, 0L, 0.0, 0.0, 0)
    media.select(col("id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          try {
            val bb = java.nio.ByteBuffer.wrap(r.payload)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            def str4() = { val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII") }
            if (str4() != "RIFF") none(r.id)
            else {
              bb.getInt // riff size
              if (str4() != "WAVE") none(r.id)
              else {
                var (fmt, channels, rate, bits) = (0, 0, 0, 0)
                var (blockAlign, samplesPerBlock, factSamples) = (0, 0, -1L)
                var info: Option[AudioInfo] = None
                def emit(nSamples: Long, sumSq: Long, first: Int): Unit = {
                  val codec = fmt match {
                    case 1 => "pcm16"
                    case 6 => "alaw"
                    case 7 => "ulaw"
                    case 17 => "ima_adpcm"
                  }
                  val frames = nSamples / channels
                  info = Some(AudioInfo(r.id, is_audio = true, codec, rate,
                    channels, frames, frames * 1000.0 / rate,
                    math.sqrt(sumSq.toDouble / math.max(nSamples, 1L)), first))
                }
                while (info.isEmpty && bb.remaining() >= 8) {
                  val cid = str4(); val len = bb.getInt
                  cid match {
                    case "fmt " =>
                      val start = bb.position()
                      fmt = bb.getShort.toInt
                      channels = bb.getShort.toInt
                      rate = bb.getInt
                      bb.getInt // byteRate
                      blockAlign = bb.getShort.toInt
                      bits = bb.getShort.toInt
                      if (fmt == 17 && len >= 20) {
                        val cb = bb.getShort.toInt
                        if (cb >= 2) samplesPerBlock = bb.getShort.toInt
                      }
                      val shapeOk = channels > 0 && rate > 0
                      val fmtOk = fmt match {
                        case 1 => bits == 16
                        case 6 | 7 => bits == 8
                        case 17 => bits == 4 && channels == 1 &&
                          samplesPerBlock > 1 && blockAlign > 4
                        case _ => false
                      }
                      if (!(shapeOk && fmtOk)) fmt = 0
                      bb.position(start + len)
                    case "fact" =>
                      factSamples = bb.getInt.toLong
                      bb.position(bb.position() + len - 4 + (len & 1))
                    case "data" if fmt == 1 =>
                      val n = len / 2
                      var (sumSq, first, i) = (0L, 0, 0)
                      while (i < n) {
                        val s = bb.getShort.toLong
                        if (i == 0) first = s.toInt
                        sumSq += s * s; i += 1
                      }
                      emit(n.toLong, sumSq, first)
                    case "data" if fmt == 6 || fmt == 7 =>
                      val dec: Byte => Short =
                        if (fmt == 6) G711.alawDecode else G711.ulawDecode
                      var (sumSq, first, i) = (0L, 0, 0)
                      while (i < len) {
                        val s = dec(bb.get()).toLong
                        if (i == 0) first = s.toInt
                        sumSq += s * s; i += 1
                      }
                      emit(len.toLong, sumSq, first)
                    case "data" if fmt == 17 =>
                      val total =
                        if (factSamples >= 0) factSamples
                        else (len.toLong / blockAlign) * samplesPerBlock
                      var (sumSq, first, produced) = (0L, 0, 0L)
                      val end = bb.position() + len
                      while (produced < total && bb.position() + blockAlign <= end) {
                        val st = new ImaAdpcm.State(bb.getShort.toInt,
                          bb.get() & 0xff)
                        bb.get() // reserved
                        if (produced == 0) first = st.pred
                        sumSq += st.pred.toLong * st.pred; produced += 1
                        var inBlock = 1
                        var bytesLeft = blockAlign - 4
                        while (bytesLeft > 0) {
                          val byte = bb.get() & 0xff
                          var half = 0
                          while (half < 2) {
                            if (inBlock < samplesPerBlock && produced < total) {
                              val s = st.decodeNibble((byte >> (half * 4)) & 0xF).toLong
                              sumSq += s * s; produced += 1; inBlock += 1
                            }
                            half += 1
                          }
                          bytesLeft -= 1
                        }
                      }
                      emit(produced, sumSq, first)
                    case _ =>
                      bb.position(bb.position() + len + (len & 1))
                  }
                }
                info.getOrElse(none(r.id))
              }
            }
          } catch {
            case _: Exception => none(r.id)
          }
        }
      }
  }

  /** REAL decode for FLAC — the transform-family lossless codec
    * ([[Flac]]: fixed predictors + Rice entropy coding, CRC-8/CRC-16/MD5
    * all verified). Lossless means the emitted fields are EXACT, so the
    * oracle replays Σs² in closed form just like the PCM row. Non-FLAC
    * (or corrupted — any failed checksum) payloads degrade to
    * is_audio = false, the decodeWav contract.
    */
  def decodeFlac(spark: SparkSession, media: DataFrame): Dataset[AudioInfo] = {
    import spark.implicits._
    val none = (id: Long) => AudioInfo(id, is_audio = false, "", 0, 0, 0L, 0.0, 0.0, 0)
    media.select(col("id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          try {
            val a = Flac.decode(r.payload)
            var sumSq = 0L
            var i = 0
            while (i < a.samples.length) {
              val s = a.samples(i).toLong; sumSq += s * s; i += 1
            }
            AudioInfo(r.id, is_audio = true, "flac", a.sampleRate, a.channels,
              a.frames, a.frames * 1000.0 / a.sampleRate,
              math.sqrt(sumSq.toDouble / math.max(a.samples.length, 1)),
              if (a.samples.nonEmpty) a.samples(0) else 0)
          } catch { case _: Exception => none(r.id) }
        }
      }
  }

  final case class VideoInfo(id: Long, is_video: Boolean, codec: String,
      width: Int, height: Int, n_frames: Int, fps: Double,
      frame_means: Array[Array[Float]])

  /** Minimal AVI writer: RIFF 'AVI ' with one uncompressed-DIB video
    * stream ('00db' frames, bottom-up BGR rows padded to 4 bytes — the
    * standard any player accepts). `frames` are solid RGB ints here;
    * arbitrary pixel buffers ride the same container.
    */
  def aviBytes(w: Int, h: Int, fps: Int, frames: Seq[Int]): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val frameBytes = rowBytes * h
    val frameChunks = frames.map { rgb =>
      val data = new Array[Byte](frameBytes)
      val (r, g, b) = (((rgb >> 16) & 0xff).toByte, ((rgb >> 8) & 0xff).toByte, (rgb & 0xff).toByte)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = y * rowBytes + x * 3
          data(o) = b; data(o + 1) = g; data(o + 2) = r
          x += 1
        }
        y += 1
      }
      aviChunk("00db", data)
    }
    aviContainer(w, h, fps, handler = "DIB ", biCompression = 0,
      frameBytes = frameBytes, frameChunks = frameChunks)
  }

  /** 'MJPG' biCompression fourcc, little-endian. */
  val MjpgFourcc: Int = 'M' | ('J' << 8) | ('P' << 16) | ('G' << 24)

  /** Solid-color JPEG via the JDK's own encoder (default quality) —
    * the per-frame payload of an MJPEG stream.
    */
  def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    disableImageIoDiskCache()
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Minimal MJPEG-in-AVI writer: same RIFF container as [[aviBytes]]
    * but each frame is an independent JPEG in a '00dc' chunk with the
    * 'MJPG' handler/compression fourcc — the first COMPRESSED codec in
    * the suite (intra-frame only; every frame decodes standalone, which
    * is exactly why MJPEG needs no native library: the JDK's JPEG
    * codec covers it).
    */
  def aviMjpegBytes(w: Int, h: Int, fps: Int, frames: Seq[Int]): Array[Byte] = {
    val frameChunks = frames.map(rgb => aviChunk("00dc", jpegBytes(w, h, rgb)))
    val maxFrame = frameChunks.map(_.length - 8).max
    aviContainer(w, h, fps, handler = "MJPG", biCompression = MjpgFourcc,
      frameBytes = maxFrame, frameChunks = frameChunks)
  }

  /** Minimal MS-RLE8 AVI writer (biCompression = 1 — the legacy
    * run-length codec every AVI player supports; the SECOND compressed
    * video codec in the suite, this one decoded entirely by our own
    * opcode walker, no JDK codec involved). 8-bit indexed frames over a
    * palette; each frame here is one solid palette color encoded as
    * per-row runs (255-pixel max per run) + end-of-line/bitmap escapes.
    */
  def aviRleBytes(w: Int, h: Int, fps: Int, colors: Seq[Int]): Array[Byte] = {
    val palette = colors.distinct
    val frameChunks = colors.map { rgb =>
      val idx = palette.indexOf(rgb)
      val out = new java.io.ByteArrayOutputStream()
      var y = 0
      while (y < h) {
        var left = w
        while (left > 0) {
          val run = math.min(left, 255)
          out.write(run); out.write(idx)
          left -= run
        }
        out.write(0); out.write(0) // end of line
        y += 1
      }
      out.write(0); out.write(1) // end of bitmap
      aviChunk("00dc", out.toByteArray)
    }
    val maxFrame = frameChunks.map(_.length - 8).max
    aviContainer(w, h, fps, handler = "MRLE", biCompression = 1,
      frameBytes = maxFrame, frameChunks = frameChunks,
      bitCount = 8, palette = palette)
  }

  /** INTER-FRAME MS-RLE8: a full keyframe, then DELTA frames that jump
    * (00 02 dx dy) straight to their one changed row, repaint it, and
    * end the bitmap — every other pixel is carried from the previous
    * frame by the decoder's persistent buffer. This is real inter-frame
    * video (frames are not independently decodable), at ~row cost per
    * frame instead of ~frame cost.
    */
  def aviRleDeltaBytes(w: Int, h: Int, fps: Int, base: Int,
      deltas: Seq[(Int, Int)]): Array[Byte] = {
    val palette = (base +: deltas.map(_._2)).distinct
    require(w <= 255 && h <= 255, "delta jumps are single-byte offsets")
    def runs(out: java.io.ByteArrayOutputStream, idx: Int): Unit = {
      var left = w
      while (left > 0) {
        val run = math.min(left, 255)
        out.write(run); out.write(idx)
        left -= run
      }
    }
    val key = {
      val out = new java.io.ByteArrayOutputStream()
      (0 until h).foreach { _ => runs(out, palette.indexOf(base)); out.write(0); out.write(0) }
      out.write(0); out.write(1)
      aviChunk("00dc", out.toByteArray)
    }
    val deltaChunks = deltas.map { case (row, color) =>
      val out = new java.io.ByteArrayOutputStream()
      if (row > 0) { out.write(0); out.write(2); out.write(0); out.write(row) }
      runs(out, palette.indexOf(color))
      out.write(0); out.write(0) // end of line
      out.write(0); out.write(1) // end of bitmap — the rest carries over
      aviChunk("00dc", out.toByteArray)
    }
    val frameChunks = key +: deltaChunks
    val maxFrame = frameChunks.map(_.length - 8).max
    aviContainer(w, h, fps, handler = "MRLE", biCompression = 1,
      frameBytes = maxFrame, frameChunks = frameChunks,
      bitCount = 8, palette = palette)
  }

  /** 'CRAM' / 'MSVC' biCompression fourccs for MS Video 1, little-endian. */
  val CramFourcc: Int = 'C' | ('R' << 8) | ('A' << 16) | ('M' << 24)
  val MsvcFourcc: Int = 'M' | ('S' << 8) | ('V' << 16) | ('C' << 24)

  /** MS Video 1 (CRAM) block opcodes, 8-bit palettized variant — the
    * suite's first LOSSY-FAMILY vector-quantization codec (the encoder
    * quantizes each 4×4 block to 1, 2, or 8 palette colors; this writer
    * takes the quantized blocks directly). Opcode grammar per the
    * public format description (wiki.multimedia.cx "Microsoft Video 1"):
    * blocks run left→right, BOTTOM→TOP; each reads two bytes (a, b):
    *   - (b & 0xFC) == 0x84 → skip ((b-0x84)<<8)+a blocks (incl. this
    *     one) — pixels carry over from the previous frame (inter-frame)
    *   - b < 0x80 → flags = (b<<8)|a, then 2 color bytes; if the FIRST
    *     color has its high bit set, 6 more follow and each 2×2
    *     quadrant uses its own color pair (8-color mode); flag bit 1
    *     selects the pair's first color, bit order raster from the
    *     block's bottom-left
    *   - otherwise → 1-color block, color = a
    */
  sealed trait Msv1Block
  final case class Msv1Skip(n: Int) extends Msv1Block
  final case class Msv1One(c: Int) extends Msv1Block
  final case class Msv1Two(flags: Int, c0: Int, c1: Int) extends Msv1Block
  final case class Msv1Eight(flags: Int, cs: Seq[Int]) extends Msv1Block

  private[graft] def msv1FrameBytes(blocks: Seq[Msv1Block]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    blocks.foreach {
      case Msv1Skip(n) =>
        require(n >= 1 && n <= 0x3ff, s"skip count $n out of opcode range")
        out.write(n & 0xff); out.write(0x84 + (n >> 8))
      case Msv1One(c) =>
        require(c >= 0 && c <= 0xff)
        out.write(c); out.write(0x90)
      case Msv1Two(flags, c0, c1) =>
        require(flags >= 0 && flags <= 0xffff && (flags >> 8) < 0x80,
          "2/8-color flags high byte must stay below 0x80")
        require(c0 < 0x80, "2-color first index with high bit set would read as 8-color")
        out.write(flags & 0xff); out.write(flags >> 8)
        out.write(c0); out.write(c1)
      case Msv1Eight(flags, cs) =>
        require(flags >= 0 && flags <= 0xffff && (flags >> 8) < 0x80)
        require(cs.length == 8 && cs.head >= 0x80,
          "8-color mode is signalled by the first index's high bit")
        out.write(flags & 0xff); out.write(flags >> 8)
        cs.foreach(out.write)
    }
    out.toByteArray
  }

  /** One MS Video 1 frame's block walk over `pix` (palette indices,
    * row 0 = BOTTOM image row — the DIB convention the RLE8 walker
    * shares). Blocks run left→right, bottom→top; within a block,
    * flag bit 0 is the bottom-left pixel and a SET bit selects the
    * pair's FIRST color. Skipped blocks keep `pix`'s previous content —
    * MSV1's native inter-frame coding. Package-visible so the spec can
    * pin pixel POSITIONS (frame means can't see orientation).
    */
  private[graft] def msv1DecodeFrame(bb: java.nio.ByteBuffer, base: Int,
      len: Int, w: Int, h: Int, pix: Array[Int]): Unit = {
    val (bw, bh) = (w / 4, h / 4)
    var p = base
    var skip = 0
    var blk = 0
    while (blk < bw * bh && (skip > 0 || p + 1 < base + len)) {
      if (skip > 0) skip -= 1
      else {
        val a = bb.get(p) & 0xff
        val b = bb.get(p + 1) & 0xff
        p += 2
        val (bx, by) = (blk % bw, blk / bw)
        if ((b & 0xFC) == 0x84) skip = ((b - 0x84) << 8) + a - 1
        else if (b < 0x80) {
          // Color payloads are bounds-checked like the opcode: a
          // truncated/corrupt frame must stop the walk at the chunk
          // edge, not silently read adjacent payload bytes as colors.
          if (p + 1 >= base + len) return
          var flags = (b << 8) | a
          val c0 = bb.get(p) & 0xff
          val c1 = bb.get(p + 1) & 0xff
          p += 2
          if ((c0 & 0x80) != 0) { // 8-color: per-2×2-quadrant pairs
            if (p + 5 >= base + len) return
            val cs = new Array[Int](8)
            cs(0) = c0; cs(1) = c1
            var k = 2
            while (k < 8) { cs(k) = bb.get(p) & 0xff; p += 1; k += 1 }
            var py = 0
            while (py < 4) {
              var px = 0
              while (px < 4) {
                val q = (py & 2) | ((px & 2) >> 1)
                pix((by * 4 + py) * w + bx * 4 + px) =
                  if ((flags & 1) != 0) cs(q * 2) else cs(q * 2 + 1)
                flags >>= 1
                px += 1
              }
              py += 1
            }
          } else {
            var py = 0
            while (py < 4) {
              var px = 0
              while (px < 4) {
                pix((by * 4 + py) * w + bx * 4 + px) =
                  if ((flags & 1) != 0) c0 else c1
                flags >>= 1
                px += 1
              }
              py += 1
            }
          }
        } else { // 1-color
          var py = 0
          while (py < 4) {
            var px = 0
            while (px < 4) {
              pix((by * 4 + py) * w + bx * 4 + px) = a
              px += 1
            }
            py += 1
          }
        }
      }
      blk += 1
    }
  }

  /** Minimal MS Video 1 AVI writer: 8-bit palettized 'CRAM' frames over
    * a caller-supplied palette; frame payloads come from
    * [[msv1FrameBytes]] over explicit block lists (so fixtures can
    * exercise every opcode, including multi-block skips).
    */
  def aviMsv1Bytes(w: Int, h: Int, fps: Int, palette: Seq[Int],
      frames: Seq[Seq[Msv1Block]]): Array[Byte] = {
    require(w % 4 == 0 && h % 4 == 0, "MS Video 1 frames are 4x4 block grids")
    val frameChunks = frames.map(bs => aviChunk("00dc", msv1FrameBytes(bs)))
    val maxFrame = frameChunks.map(_.length - 8).max
    aviContainer(w, h, fps, handler = "CRAM", biCompression = CramFourcc,
      frameBytes = maxFrame, frameChunks = frameChunks,
      bitCount = 8, palette = palette)
  }

  private def aviChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    bb.array()
  }

  /** Shared RIFF 'AVI ' assembly for [[aviBytes]] / [[aviMjpegBytes]]:
    * one video stream, frame chunks supplied by the caller.
    */
  private def aviContainer(w: Int, h: Int, fps: Int, handler: String,
      biCompression: Int, frameBytes: Int,
      frameChunks: Seq[Array[Byte]],
      bitCount: Int = 24, palette: Seq[Int] = Nil): Array[Byte] = {
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      aviChunk("LIST", kind.getBytes("US-ASCII") ++ body)
    def le(ints: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(ints.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      ints.foreach(bb.putInt)
      bb.array()
    }
    val avih = aviChunk("avih", le(1000000 / fps, frameBytes * fps, 0, 0x10,
      frameChunks.length, 0, 1, frameBytes, w, h, 0, 0, 0, 0))
    val strh = aviChunk("strh",
      "vids".getBytes("US-ASCII") ++ handler.getBytes("US-ASCII") ++
        le(0, 0, 0, 1, fps, 0, frameChunks.length, frameBytes, -1, 0, 0))
    // palette entries are RGBQUAD (B, G, R, 0) after the 40-byte header
    val palBytes = palette.flatMap(rgb => Seq(
      (rgb & 0xff).toByte, ((rgb >> 8) & 0xff).toByte,
      ((rgb >> 16) & 0xff).toByte, 0.toByte)).toArray
    val strf = aviChunk("strf",
      le(40, w, h, 1 | (bitCount << 16), biCompression, frameBytes, 0, 0,
        palette.length, 0) ++ palBytes)
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frameChunks.reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    aviChunk("RIFF", body)
  }

  /** REAL video decode for AVI: uncompressed-DIB ('00db' raw BGR rows),
    * MJPEG ('00dc' per-frame JPEG via the JDK's own codec), AND MS-RLE8
    * ('00dc' with biCompression 1 — run/escape opcodes walked by our
    * own decoder over the strf palette; lossless, so means are exact
    * like DIB's) — all pure JDK. RIFF/LIST walking is shared; the strf
    * biCompression fourcc selects the frame decoder. Emits header
    * geometry, fps, the codec tag, and one mean-RGB feature vector per
    * frame (exact for DIB/RLE8; for MJPEG, whatever the JDK's JPEG
    * decoder returns — the oracle-facing query buckets those means so
    * lossy round-trip error cannot flip a value). Only INTER-frame
    * codecs (H.264/VP9/…) remain stubbed — they genuinely need a
    * native library. Anything that is not a decodable AVI degrades to
    * is_video = false.
    */
  def decodeAvi(spark: SparkSession, media: DataFrame): Dataset[VideoInfo] = {
    import spark.implicits._
    val none = (id: Long) => VideoInfo(id, is_video = false, "", 0, 0, 0, 0.0, Array.empty)
    media.select(col("id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { r =>
          try {
            val bb = java.nio.ByteBuffer.wrap(r.payload)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            def str4() = { val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII") }
            if (str4() != "RIFF") none(r.id)
            else {
              bb.getInt
              if (str4() != "AVI ") none(r.id)
              else {
                var (w, h, bits, usPerFrame, compression) = (0, 0, 0, 0, 0)
                var palette: Array[Int] = Array.empty
                // RLE8 frame buffer PERSISTS across frames: skipped
                // pixels (delta/EOL/EOB opcodes) keep their previous
                // frame's value — that carry IS inter-frame coding,
                // and it is what makes delta frames decodable
                var rlePix: Array[Int] = null
                val means = scala.collection.mutable.ArrayBuffer[Array[Float]]()
                def walk(end: Int): Unit =
                  while (bb.position() + 8 <= end) {
                    val cid = str4(); val len = bb.getInt
                    val next = bb.position() + len + (len & 1)
                    cid match {
                      case "LIST" => str4(); walk(next)
                      case "avih" =>
                        usPerFrame = bb.getInt
                        // skip maxBytesPerSec, padding, flags, totalFrames,
                        // initialFrames, streams, suggestedBufferSize
                        bb.position(bb.position() + 28)
                        w = bb.getInt; h = bb.getInt
                      case "strf" =>
                        val strfStart = bb.position()
                        bb.getInt // biSize
                        w = bb.getInt; h = bb.getInt
                        bits = bb.getInt >>> 16 // planes | bitCount<<16
                        if (len >= 20) compression = bb.getInt
                        if (len > 40) { // RGBQUAD palette after the header
                          bb.position(strfStart + 40)
                          palette = Array.fill((len - 40) / 4) {
                            val pb = bb.get() & 0xff; val pg = bb.get() & 0xff
                            val pr = bb.get() & 0xff; bb.get()
                            (pr << 16) | (pg << 8) | pb
                          }
                        }
                      case c if c.endsWith("db") && w > 0 && h > 0 && bits == 24 &&
                          compression == 0 =>
                        val rowBytes = (w * 3 + 3) & ~3
                        var (sr, sg, sb) = (0L, 0L, 0L)
                        val base = bb.position()
                        var y = 0
                        while (y < h) {
                          var x = 0
                          while (x < w) {
                            val o = base + y * rowBytes + x * 3
                            sb += bb.get(o) & 0xff
                            sg += bb.get(o + 1) & 0xff
                            sr += bb.get(o + 2) & 0xff
                            x += 1
                          }
                          y += 1
                        }
                        val n = (w.toLong * h).toFloat
                        means += Array(sr / n, sg / n, sb / n)
                      case c if c.endsWith("dc") && compression == 1 &&
                          w > 0 && h > 0 && bits == 8 =>
                        // MS-RLE8: (count, index) runs; escapes 00 00 =
                        // end-of-line, 00 01 = end-of-bitmap, 00 02 dx dy =
                        // delta skip, 00 n>=3 = n absolute pixels (word-
                        // padded). Untouched pixels keep the PREVIOUS
                        // frame's value (index 0 on the first frame).
                        if (rlePix == null || rlePix.length != w * h)
                          rlePix = new Array[Int](w * h)
                        val pix = rlePix
                        val base = bb.position()
                        var p = base
                        var (x, row) = (0, 0)
                        var done = false
                        while (!done && p + 1 < base + len) {
                          val b1 = bb.get(p) & 0xff
                          val b2 = bb.get(p + 1) & 0xff
                          p += 2
                          if (b1 > 0) {
                            var k = 0
                            while (k < b1) {
                              if (row < h && x < w) pix(row * w + x) = b2
                              x += 1; k += 1
                            }
                          } else b2 match {
                            case 0 => x = 0; row += 1
                            case 1 => done = true
                            case 2 =>
                              x += bb.get(p) & 0xff
                              row += bb.get(p + 1) & 0xff
                              p += 2
                            case cnt =>
                              var k = 0
                              while (k < cnt) {
                                if (row < h && x < w) pix(row * w + x) = bb.get(p + k) & 0xff
                                x += 1; k += 1
                              }
                              p += cnt + (cnt & 1)
                          }
                        }
                        var (sr, sg, sb) = (0L, 0L, 0L)
                        pix.foreach { i =>
                          val rgb = if (i < palette.length) palette(i) else 0
                          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                        }
                        val np = (w.toLong * h).toFloat
                        means += Array(sr / np, sg / np, sb / np)
                      case c if c.endsWith("dc") && (compression == CramFourcc ||
                          compression == MsvcFourcc) && w > 0 && h > 0 && bits == 8 =>
                        // MS Video 1 (CRAM), 8-bit palettized: 4×4
                        // blocks left→right / bottom→top; opcode pairs
                        // (a, b) select skip / 2-color / 8-color /
                        // 1-color per the public format description
                        // (see aviMsv1Bytes). The frame buffer PERSISTS
                        // across frames: skipped blocks carry the
                        // previous frame's pixels — MSV1's native
                        // inter-frame coding.
                        if (rlePix == null || rlePix.length != w * h)
                          rlePix = new Array[Int](w * h)
                        val pix = rlePix
                        msv1DecodeFrame(bb, bb.position(), len, w, h, pix)
                        var (sr, sg, sb) = (0L, 0L, 0L)
                        pix.foreach { i =>
                          val rgb = if (i < palette.length) palette(i) else 0
                          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                        }
                        val np = (w.toLong * h).toFloat
                        means += Array(sr / np, sg / np, sb / np)
                      case c if c.endsWith("dc") && compression == MjpgFourcc =>
                        val jpeg = new Array[Byte](len)
                        bb.get(jpeg)
                        val img = javax.imageio.ImageIO.read(
                          new java.io.ByteArrayInputStream(jpeg))
                        if (img != null) {
                          val (iw, ih) = (img.getWidth, img.getHeight)
                          val row = new Array[Int](iw)
                          var (sr, sg, sb) = (0L, 0L, 0L)
                          var y = 0
                          while (y < ih) {
                            img.getRGB(0, y, iw, 1, row, 0, iw)
                            var x = 0
                            while (x < iw) {
                              val rgb = row(x)
                              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                              x += 1
                            }
                            y += 1
                          }
                          val n = (iw.toLong * ih).max(1L).toFloat
                          means += Array(sr / n, sg / n, sb / n)
                        }
                      case _ => ()
                    }
                    bb.position(next.min(end))
                  }
                walk(r.payload.length)
                if (means.isEmpty || w <= 0 || h <= 0) none(r.id)
                else VideoInfo(r.id, is_video = true,
                  if (compression == MjpgFourcc) "MJPG"
                  else if (compression == CramFourcc || compression == MsvcFourcc) "MSV1"
                  else if (compression == 1) "RLE8" else "DIB",
                  w, h, means.length,
                  if (usPerFrame > 0) 1e6 / usPerFrame else 0.0, means.toArray)
              }
            }
          } catch { case _: Exception => none(r.id) }
        }
      }
  }

  /** REAL thumbnail resize via headless-AWT bilinear scaling, re-encoded
    * as PNG bytes. Non-image payloads pass through as empty thumbnails
    * (same degrade-don't-fail contract as [[decodeImages]]).
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
      outW: Int = 16, outH: Int = 16): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    require(outW > 0 && outH > 0, "thumbnail dims must be positive")
    media.select(col("id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        disableImageIoDiskCache()
        it.map { r =>
          val thumb =
            try {
              val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
              if (img == null) Array.empty[Byte]
              else {
                val out = new java.awt.image.BufferedImage(
                  outW, outH, java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = out.createGraphics()
                try {
                  g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img, 0, 0, outW, outH, null)
                } finally g.dispose()
                val baos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", baos)
                baos.toByteArray
              }
            } catch { case _: Exception => Array.empty[Byte] }
          (r.id, thumb)
        }
      }
  }

  /** Resize stub — the image-thumbnail shape: payload bytes reduced to a
    * fixed `outLen`-byte thumbnail by bucket-averaging. A real resizer is
    * a per-partition batched native call with exactly this signature;
    * the deterministic fake keeps the batching, schema, and partitioning
    * real (and testable) without an image library.
    */
  def resizeStub(spark: SparkSession, media: DataFrame, outLen: Int = 16): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    media.select(col("id"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.map { r =>
          val out = new Array[Byte](outLen)
          if (r.payload.nonEmpty) {
            val bucket = math.max(1, r.payload.length / outLen)
            var b = 0
            while (b < outLen) {
              val from = b * bucket
              val to = math.min(r.payload.length, from + bucket)
              if (from < r.payload.length) {
                var sum = 0L
                var i = from
                while (i < to) { sum += java.lang.Byte.toUnsignedInt(r.payload(i)); i += 1 }
                out(b) = (sum / (to - from)).toByte
              }
              b += 1
            }
          }
          (r.id, out)
        }
      }
  }
}
