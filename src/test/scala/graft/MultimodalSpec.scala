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

  /** A solid-color PNG, generated with the same JDK ImageIO the decoder
    * uses — real image bytes without any fixture or external library.
    */
  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("decodeImages: real PNG bytes yield dims and mean color; text payloads degrade") {
    val rows = Seq(
      (1L, pngBytes(8, 4, 0xff0000)),  // solid red
      (2L, pngBytes(3, 5, 0x0080ff)),
      (3L, "not an image at all".getBytes("UTF-8")))
    val decoded = Multimodal.decodeImages(spark, rows.toDF("id", "payload"))
      .collect().map(i => i.id -> i).toMap
    assert(decoded(1L).is_image && decoded(1L).width === 8 && decoded(1L).height === 4)
    assert(decoded(1L).mean_rgb.toSeq === Seq(255f, 0f, 0f))
    assert(decoded(2L).is_image && decoded(2L).width === 3 && decoded(2L).height === 5)
    assert(decoded(2L).mean_rgb.toSeq === Seq(0f, 128f, 255f))
    assert(!decoded(3L).is_image && decoded(3L).mean_rgb.isEmpty)
  }

  test("resizeImages: thumbnail roundtrips through the decoder at the target dims") {
    val rows = Seq(
      (1L, pngBytes(32, 16, 0x00ff00)), // solid green survives scaling exactly
      (2L, "still not an image".getBytes("UTF-8")))
    val thumbs = Multimodal.resizeImages(spark, rows.toDF("id", "payload"), outW = 4, outH = 4)
      .collect().toMap
    assert(thumbs(2L).isEmpty, "non-image payloads degrade to empty thumbnails")
    val back = Multimodal.decodeImages(spark,
      Seq((1L, thumbs(1L))).toDF("id", "payload")).head()
    assert(back.is_image && back.width === 4 && back.height === 4)
    assert(back.mean_rgb.toSeq === Seq(0f, 255f, 0f))
  }

  test("decodeImages over the fixture corpus: every text payload degrades, none throws") {
    val decoded = Multimodal.decodeImages(spark, media)
    assert(decoded.filter(_.is_image).count() === 0)
    assert(decoded.count() === media.count())
  }

  test("decodeWav: written PCM WAV roundtrips and the JDK's own reader agrees") {
    import spark.implicits._
    val samples = Array.tabulate(1000)(i => ((i % 201) - 100).toShort)
    val wav = Multimodal.wavBytes(16000, 1, samples)

    // independent cross-check: javax.sound.sampled parses the same bytes
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate === 16000f)
    assert(ais.getFormat.getChannels === 1)
    assert(ais.getFormat.getSampleSizeInBits === 16)
    assert(ais.getFrameLength === 1000L)

    val info = Multimodal.decodeWav(spark, Seq((7L, wav)).toDF("id", "payload")).head()
    assert(info.is_audio && info.sample_rate === 16000 && info.channels === 1)
    assert(info.n_samples === 1000L)
    assert(info.duration_ms === 62.5)
    val expectedRms = math.sqrt(samples.map(s => s.toLong * s).sum.toDouble / 1000)
    assert(info.rms === expectedRms)
  }

  test("decodeAvi: uncompressed AVI roundtrips geometry, fps, and exact frame colors") {
    import spark.implicits._
    val avi = Multimodal.aviBytes(w = 5, h = 3, fps = 25, frames = Seq(0xFF0000, 0x00FF00, 0x0000FF))
    val v = Multimodal.decodeAvi(spark, Seq((9L, avi)).toDF("id", "payload")).head()
    assert(v.is_video && v.width === 5 && v.height === 3)
    assert(v.n_frames === 3 && v.fps === 25.0)
    assert(v.frame_means.map(_.toSeq).toSeq === Seq(
      Seq(255f, 0f, 0f), Seq(0f, 255f, 0f), Seq(0f, 0f, 255f)))

    // width 3: row padding (9 -> 12 bytes) must not leak into means
    val padded = Multimodal.aviBytes(w = 3, h = 2, fps = 10, frames = Seq(0x102030))
    val p = Multimodal.decodeAvi(spark, Seq((1L, padded)).toDF("id", "payload")).head()
    assert(p.frame_means.head.toSeq === Seq(0x10.toFloat, 0x20.toFloat, 0x30.toFloat))

    // junk degrades, never throws
    val junk = Multimodal.decodeAvi(spark,
      Seq((2L, "RIFFxxxxWAVE".getBytes("UTF-8"))).toDF("id", "payload")).head()
    assert(!junk.is_video)
  }

  test("decodeAvi: MJPEG frames decode per-frame JPEG, gray means stay in-bucket") {
    import spark.implicits._
    // grays pinned to 8-wide bucket CENTERS (8k+4): the lossy JPEG
    // round trip of a solid gray moves the mean < 4, so floor(mean/8)
    // recovers k — the exact contract multimodal_video_mjpeg's oracle
    // relies on
    val grays = Seq(4, 100, 252)
    val avi = Multimodal.aviMjpegBytes(w = 7, h = 6, fps = 10,
      frames = grays.map(g => (g << 16) | (g << 8) | g))
    val v = Multimodal.decodeAvi(spark, Seq((3L, avi)).toDF("id", "payload")).head()
    assert(v.is_video && v.codec === "MJPG")
    assert(v.width === 7 && v.height === 6 && v.n_frames === 3 && v.fps === 10.0)
    v.frame_means.zip(grays).foreach { case (m, g) =>
      m.foreach { c =>
        assert(math.abs(c - g) < 4.0f, s"channel mean $c strayed from gray $g")
        assert(math.floor(c / 8).toInt === (g - 4) / 8)
      }
    }
    // the DIB row keeps its codec tag too
    val dib = Multimodal.decodeAvi(spark,
      Seq((4L, Multimodal.aviBytes(3, 2, 10, Seq(0x102030)))).toDF("id", "payload")).head()
    assert(dib.codec === "DIB")
  }

  test("G.711: quantization levels round-trip exactly, JDK's own ULAW decoder agrees") {
    import spark.implicits._
    // μ-law decode levels at segment 0 are 8k (|k| <= 15); A-law's are
    // ±(16k+8) — samples ON a level must survive the 2:1 companding
    // bit-exactly (the closed-form-oracle contract of
    // multimodal_audio_g711)
    val uSamples = Array.tabulate(256)(i => (8 * ((i % 31) - 15)).toShort)
    val uWav = Multimodal.wavBytesG711(8000, 1, uSamples, aLaw = false)
    val u = Multimodal.decodeWav(spark, Seq((1L, uWav)).toDF("id", "payload")).head()
    assert(u.is_audio && u.codec === "ulaw" && u.sample_rate === 8000)
    assert(u.n_samples === 256L && u.first_sample === uSamples(0).toInt)
    assert(u.rms === math.sqrt(uSamples.map(s => s.toLong * s).sum.toDouble / 256))

    val aSamples = Array.tabulate(256) { i =>
      val k = (i % 31) - 15
      (if (k < 0) -(16 * -k + 8) else 16 * k + 8).toShort
    }
    val aWav = Multimodal.wavBytesG711(8000, 1, aSamples, aLaw = true)
    val a = Multimodal.decodeWav(spark, Seq((2L, aWav)).toDF("id", "payload")).head()
    assert(a.is_audio && a.codec === "alaw" && a.n_samples === 256L)
    assert(a.first_sample === aSamples(0).toInt)
    assert(a.rms === math.sqrt(aSamples.map(s => s.toLong * s).sum.toDouble / 256))

    // independent cross-check: javax.sound parses the same μ-law bytes
    // and its ULAW→PCM converter must produce OUR decode values
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(uWav))
    assert(ais.getFormat.getEncoding ===
      javax.sound.sampled.AudioFormat.Encoding.ULAW)
    val pcmFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, ais)
    val buf = pcm.readAllBytes()
    val jdk = java.nio.ByteBuffer.wrap(buf)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    uSamples.indices.foreach { i =>
      val ours = Multimodal.G711.ulawDecode(Multimodal.G711.ulawEncode(uSamples(i)))
      assert(jdk.get(i) === ours, s"JDK ULAW decode disagrees at sample $i")
    }

    // and the same independent cross-check for A-law
    val aAis = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(aWav))
    assert(aAis.getFormat.getEncoding ===
      javax.sound.sampled.AudioFormat.Encoding.ALAW)
    val aPcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, aAis)
    val aJdk = java.nio.ByteBuffer.wrap(aPcm.readAllBytes())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
    aSamples.indices.foreach { i =>
      val ours = Multimodal.G711.alawDecode(Multimodal.G711.alawEncode(aSamples(i)))
      assert(aJdk.get(i) === ours, s"JDK ALAW decode disagrees at sample $i")
    }

    // off-level samples: companding error is bounded by the segment
    // step (≤ 8·2^7 = 1024 on the 16-bit scale) across the full range
    var s = -32768
    while (s < 32768) {
      val v = s.toShort
      val eu = Multimodal.G711.ulawDecode(Multimodal.G711.ulawEncode(v)) - s
      val ea = Multimodal.G711.alawDecode(Multimodal.G711.alawEncode(v)) - s
      assert(math.abs(eu) <= 1024, s"ulaw err $eu at $s")
      assert(math.abs(ea) <= 1024, s"alaw err $ea at $s")
      s += 37
    }
  }

  test("IMA ADPCM: header sample exact, constants lossless, ramp error bounded") {
    import spark.implicits._
    // constant signal: every nibble is 0 and step floors, so the 4:1
    // codec reproduces the signal bit-exactly
    val const = Array.fill(1011)(1234.toShort)
    val cWav = Multimodal.wavBytesImaAdpcm(16000, const, samplesPerBlock = 505)
    val c = Multimodal.decodeWav(spark, Seq((1L, cWav)).toDF("id", "payload")).head()
    assert(c.is_audio && c.codec === "ima_adpcm" && c.sample_rate === 16000)
    assert(c.n_samples === 1011L, "fact chunk must bound the decoded count")
    assert(c.first_sample === 1234)
    assert(c.rms === 1234.0)

    // gentle ramp: the adaptive step tracks a bounded slope closely —
    // decode the nibble stream back with the mirrored state machine and
    // pin a per-sample error bound (integer state machine: the bound is
    // exact and platform-independent, measured max on this ramp is ~40)
    val ramp = Array.tabulate(2000)(i =>
      ((math.abs((i * 13) % 800 - 400) - 200) * 5).toShort)
    val enc = new Multimodal.ImaAdpcm.State(ramp(0).toInt, 0)
    val dec = new Multimodal.ImaAdpcm.State(ramp(0).toInt, 0)
    var maxErr = 0
    (1 until ramp.length).foreach { i =>
      val n = enc.encodeSample(ramp(i).toInt)
      val rec = dec.decodeNibble(n)
      maxErr = math.max(maxErr, math.abs(rec - ramp(i)))
    }
    assert(maxErr <= 128, s"adpcm ramp error $maxErr exceeded bound")

    // multi-block WAV: first sample exact, count from fact, RMS close
    // to the source signal's (codec error << signal RMS)
    val rWav = Multimodal.wavBytesImaAdpcm(16000, ramp, samplesPerBlock = 505)
    val r = Multimodal.decodeWav(spark, Seq((2L, rWav)).toDF("id", "payload")).head()
    assert(r.n_samples === 2000L && r.first_sample === ramp(0).toInt)
    val srcRms = math.sqrt(ramp.map(s => s.toLong * s).sum.toDouble / ramp.length)
    assert(math.abs(r.rms - srcRms) <= 8.0,
      s"decoded rms ${r.rms} strayed from source rms $srcRms")
  }

  test("decodeAvi: MS-RLE8 frames decode through the palette with exact colors") {
    import spark.implicits._
    // RLE8 is lossless: solid frames must round-trip their exact
    // palette colors, including a width > 255 (multi-run rows)
    val colors = Seq(0xFF0000, 0x00FF00, 0xFF0000, 0x123456)
    val avi = Multimodal.aviRleBytes(w = 300, h = 3, fps = 10, colors)
    val v = Multimodal.decodeAvi(spark, Seq((5L, avi)).toDF("id", "payload")).head()
    assert(v.is_video && v.codec === "RLE8")
    assert(v.width === 300 && v.height === 3 && v.n_frames === 4 && v.fps === 10.0)
    v.frame_means.zip(colors).foreach { case (m, rgb) =>
      assert(m.toSeq === Seq(((rgb >> 16) & 0xff).toFloat,
        ((rgb >> 8) & 0xff).toFloat, (rgb & 0xff).toFloat))
    }
  }

  test("decodeAvi: RLE8 DELTA frames carry the previous frame's pixels (inter-frame)") {
    import spark.implicits._
    // keyframe = solid 100-gray; two delta frames each repaint ONE row
    // (different rows!) — the second frame's mean must include BOTH
    // accumulated changes, which only a persistent frame buffer gives
    val base = 0x646464 // 100,100,100
    val avi = Multimodal.aviRleDeltaBytes(w = 10, h = 5, fps = 10, base,
      deltas = Seq((1, 0x969696 /* 150 */), (3, 0xC8C8C8 /* 200 */)))
    val v = Multimodal.decodeAvi(spark, Seq((6L, avi)).toDF("id", "payload")).head()
    assert(v.is_video && v.codec === "RLE8" && v.n_frames === 3)
    val grays = v.frame_means.map(_.head)
    assert(grays(0) === 100f)
    assert(grays(1) === (4 * 100 + 150) / 5f, "delta 1: four carried rows + one repainted")
    assert(grays(2) === (3 * 100 + 150 + 200) / 5f,
      "delta 2 must ACCUMULATE on top of delta 1's buffer")
    // all three channels agree (gray in, gray out)
    v.frame_means.foreach(m => assert(m(0) === m(1) && m(1) === m(2)))
  }

  test("MSV1: opcode walk paints exact pixel POSITIONS per the public block grammar") {
    import graft.multimodal.Multimodal._
    // 8×8 = 2×2 blocks, decode order bottom-left, bottom-right,
    // top-left, top-right; bit 0 = block's bottom-left pixel; a SET
    // bit selects the pair's FIRST color; 8-color quadrants keyed by
    // (py&2)|((px&2)>>1) over the same bottom-up coordinates.
    val frame = msv1FrameBytes(Seq(
      Msv1Two(0x0001, 7, 2), // only bit 0 set → one c0 pixel
      Msv1One(4),
      Msv1One(5),
      Msv1Eight(0x0004, Seq(0x84, 1, 2, 3, 9, 5, 6, 11))))
    val pix = new Array[Int](64)
    msv1DecodeFrame(java.nio.ByteBuffer.wrap(frame), 0, frame.length, 8, 8, pix)
    def at(bx: Int, by: Int, px: Int, py: Int) = pix((by * 4 + py) * 8 + bx * 4 + px)
    assert(at(0, 0, 0, 0) === 7, "set flag bit 0 → first color at block bottom-left")
    for (py <- 0 until 4; px <- 0 until 4 if (px, py) != ((0, 0)))
      assert(at(0, 0, px, py) === 2, s"clear bit ($px,$py) → second color")
    for (py <- 0 until 4; px <- 0 until 4) {
      assert(at(1, 0, px, py) === 4)
      assert(at(0, 1, px, py) === 5)
    }
    // 8-color block (top-right): flags bit 2 → (px=2, py=0) in
    // quadrant 1 gets its pair's FIRST color 2; everything else the
    // quadrant's second color
    val expectSecond = Map(0 -> 1, 1 -> 3, 2 -> 5, 3 -> 11)
    for (py <- 0 until 4; px <- 0 until 4) {
      val q = (py & 2) | ((px & 2) >> 1)
      val want = if ((px, py) == ((2, 0))) 2 else expectSecond(q)
      assert(at(1, 1, px, py) === want, s"8-color pixel ($px,$py) quadrant $q")
    }
  }

  test("MSV1: truncated color payloads stop the walk at the chunk edge") {
    import graft.multimodal.Multimodal._
    val full = msv1FrameBytes(Seq(
      Msv1Two(0x0001, 7, 2),
      Msv1Eight(0x0004, Seq(0x84, 1, 2, 3, 9, 5, 6, 11))))
    // pad the buffer past the chunk with bytes that WOULD paint if read
    val padded = full ++ Array.fill[Byte](16)(0x3f)
    for (cut <- Seq(
        3, // 2-color opcode present, color pair truncated
        full.length - 3)) { // 8-color opcode+pair present, quadrant colors cut
      val pix = Array.fill(64)(-1)
      msv1DecodeFrame(java.nio.ByteBuffer.wrap(padded), 0, cut, 8, 8, pix)
      assert(!pix.contains(0x3f),
        s"len=$cut: no pixel may come from bytes beyond the chunk")
    }
    // sanity: the untruncated frame still paints both blocks
    val pix = Array.fill(64)(-1)
    msv1DecodeFrame(java.nio.ByteBuffer.wrap(padded), 0, full.length, 8, 8, pix)
    assert(pix(0) === 7 && pix.count(_ >= 0) === 32)
  }

  test("decodeAvi: MSV1 skip opcodes carry previous-frame blocks (inter-frame)") {
    import spark.implicits._
    import graft.multimodal.Multimodal._
    // grays for easy means: palette j → j*10 on every channel
    val pal = (0 until 8).map(j => (j * 10 << 16) | (j * 10 << 8) | j * 10)
    val avi = aviMsv1Bytes(8, 8, fps = 10, pal, Seq(
      Seq(Msv1One(1), Msv1One(2), Msv1One(3), Msv1One(4)),
      // skip 2 blocks, repaint block 2, trailing 1-block skip
      Seq(Msv1Skip(2), Msv1One(6), Msv1Skip(1)),
      Seq(Msv1Skip(4)))) // skip-everything frame: pure carry
    val v = Multimodal.decodeAvi(spark, Seq((9L, avi)).toDF("id", "payload")).head()
    assert(v.is_video && v.codec === "MSV1" && v.n_frames === 3)
    assert(v.width === 8 && v.height === 8 && v.fps === 10.0)
    val grays = v.frame_means.map(_.head)
    assert(grays(0) === (10 + 20 + 30 + 40) / 4f)
    assert(grays(1) === (10 + 20 + 60 + 40) / 4f, "skipped blocks must carry")
    assert(grays(2) === grays(1), "skip-everything frame repeats the buffer")
    v.frame_means.foreach(m => assert(m(0) === m(1) && m(1) === m(2)))
  }

  test("decodeWav: stereo frames, odd-chunk padding, and degrade paths") {
    import spark.implicits._
    val stereo = Multimodal.wavBytes(8000, 2, Array.tabulate(512)(i => i.toShort))
    val s = Multimodal.decodeWav(spark, Seq((1L, stereo)).toDF("id", "payload")).head()
    assert(s.is_audio && s.channels === 2 && s.n_samples === 256L) // frames, not samples

    // non-audio payloads and truncated headers degrade, never throw
    val junk = Seq((2L, "not audio".getBytes("UTF-8")), (3L, Array[Byte](82, 73)))
      .toDF("id", "payload")
    val decoded = Multimodal.decodeWav(spark, junk).collect()
    assert(decoded.forall(!_.is_audio))
  }

  test("FLAC: mono roundtrips bit-exactly; smooth signals actually compress") {
    import graft.multimodal.Flac
    // deterministic mix: smooth ramp + small noise, partial last block
    val n = 3000
    val samples = Array.tabulate(n) { i =>
      (i * 3 + ((i * 2654435761L >>> 16) % 7).toInt - 3).toShort
    }
    for (bs <- Seq(256, 1024, 4096)) { // 3000 % 256 != 0 → partial tail frame
      val bytes = Flac.flacBytes(8000, 1, samples, bs)
      val a = Flac.decode(bytes)
      assert(a.sampleRate === 8000 && a.channels === 1 && a.bps === 16)
      assert(a.frames === n.toLong)
      assert(a.samples.toSeq === samples.map(_.toInt).toSeq, s"blockSize=$bs")
      assert(bytes.length < n * 2, s"no compression at blockSize=$bs")
    }
    // linear ramp: order-2 predictor zeroes every residual → tiny file
    val ramp = Array.tabulate(2048)(i => (i * 5).toShort)
    assert(Flac.flacBytes(8000, 1, ramp).length < 2048 / 2)
    // constant → CONSTANT subframes
    val const = Array.fill[Short](2048)(1234)
    val cb = Flac.flacBytes(8000, 1, const)
    assert(cb.length < 200)
    assert(Flac.decode(cb).samples.forall(_ === 1234))
  }

  test("FLAC: correlated stereo picks mid/side and roundtrips exactly") {
    import graft.multimodal.Flac
    val frames = 1500
    val inter = new Array[Short](frames * 2)
    var i = 0
    while (i < frames) {
      val base = (math.sin(i / 40.0) * 5000).toInt
      inter(2 * i) = base.toShort                         // left
      inter(2 * i + 1) = (base + (i % 5) - 2).toShort     // right ≈ left
      i += 1
    }
    val bytes = Flac.flacBytes(16000, 2, inter, 512)
    val a = Flac.decode(bytes)
    assert(a.channels === 2 && a.frames === frames.toLong)
    assert(a.samples.toSeq === inter.map(_.toInt).toSeq)
    // decorrelation must beat independent coding on this signal
    val indepish = Array.tabulate(frames * 2)(j =>
      (((j * 2654435761L) >>> 13) % 20000 - 10000).toShort)
    val noisy = Flac.flacBytes(16000, 2, indepish, 512)
    assert(bytes.length < noisy.length, "correlated stereo should compress harder")
  }

  test("FLAC: any flipped byte fails a checksum; decodeFlac degrades, never lies") {
    import graft.multimodal.Flac
    import spark.implicits._
    val samples = Array.tabulate(1000)(i => (i * 7 % 3001 - 1500).toShort)
    val good = Flac.flacBytes(8000, 1, samples, 512)
    // corrupt one payload byte inside frame data (past magic + streaminfo)
    val bad = good.clone(); bad(good.length - 40) = (bad(good.length - 40) ^ 0x40).toByte
    assertThrows[Exception](Flac.decode(bad))
    val df = Seq((1L, good), (2L, bad), (3L, "text".getBytes("UTF-8")))
      .toDF("id", "payload")
    val rows = Multimodal.decodeFlac(spark, df).collect().sortBy(_.id)
    assert(rows(0).is_audio && rows(0).codec === "flac" &&
      rows(0).n_samples === 1000L && rows(0).first_sample === -1500)
    assert(!rows(1).is_audio && !rows(2).is_audio)
    // RMS agrees exactly with the PCM-WAV decode of the same samples
    val wav = Multimodal.decodeWav(spark,
      Seq((1L, Multimodal.wavBytes(8000, 1, samples))).toDF("id", "payload")).head()
    assert(rows(0).rms === wav.rms && rows(0).duration_ms === wav.duration_ms)
  }
}
