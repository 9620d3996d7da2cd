package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8"), 4000L),
    (2L, "image", "fake-png-bytes-bbbb".getBytes("UTF-8"), 4000L),
    (3L, "video", "fake-mp4-bytes".getBytes("UTF-8"), 2500L))
    .toDF("media_id", "kind", "content", "durationMs")

  test("extractFeatures: dim-length deterministic vectors in [0,1), content dropped") {
    val out = Multimodal.extractFeatures(media, "media_id", "content", 8)
    assert(out.columns.toSeq == Seq("media_id", "features"))
    val got = rows(out).map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.values.forall(f => f.length == 8 && f.forall(v => v >= 0.0 && v < 1.0)))
    // deterministic: same bytes ⇒ same features; different bytes ⇒ different
    val again = Multimodal.extractFeatures(media, "media_id", "content", 8)
    assert(rows(again).map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap == got)
    assert(got(1L) != got(2L))
  }

  test("extractFeatures respects small batch sizes (batched codec shape)") {
    val out = Multimodal.extractFeatures(media, "media_id", "content", 2, batchSize = 1)
    assert(out.count() == 3)
  }

  test("sampleFrames explodes one row per interval over the duration") {
    val out = Multimodal.sampleFrames(media, "media_id", "durationMs", 1000L)
    val byId = rows(out).groupBy(_.getLong(0))
    // 4000 ms at 1000 ms ⇒ frames 0..3; 2500 ms ⇒ frames 0..2
    assert(byId(1L).map(_.getAs[Long]("frame_ts_ms")).sorted == Seq(0L, 1000L, 2000L, 3000L))
    assert(byId(3L).map(_.getAs[Long]("frame_ts_ms")).sorted == Seq(0L, 1000L, 2000L))
  }

  test("sampleFrames emits no rows for zero or null duration (regression: spurious frame 0)") {
    val edgeDur = Seq(
      (9L, "video", "x".getBytes("UTF-8"), Some(0L)),
      (10L, "video", "y".getBytes("UTF-8"), Option.empty[Long]))
      .toDF("media_id", "kind", "content", "durationMs")
    assert(Multimodal.sampleFrames(edgeDur, "media_id", "durationMs", 1000L).count() == 0)
  }

  test("resize produces (w*h)-sized stub content with updated metadata") {
    val out = Multimodal.resize(media, 64, 64)
    val r = rows(out.filter(col("media_id") === 1L)).head
    assert(r.getAs[Array[Byte]]("content") != null)
    assert(r.getAs[Long]("sizeBytes") == (64 * 64) / 64)
    assert(r.getAs[Int]("width") == 64 && r.getAs[Int]("height") == 64)
  }

  test("repartitionForMedia sizes partitions by bytes") {
    val out = Multimodal.repartitionForMedia(media, targetBytesPerPartition = 20L)
    assert(out.rdd.getNumPartitions >= 2)
    assert(out.count() == 3)
  }

  /** A real w×h PNG: left half black, right half white. */
  private def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG content is decoded by javax.imageio, not the stub") {
    val bytes = png(16, 16)
    assert(Multimodal.PngCodec.isPng(bytes))
    val mixed = Seq(
      (1L, "image", bytes),
      (2L, "audio", "not a png".getBytes("UTF-8")))
      .toDF("media_id", "kind", "content")
    val feats = rows(Multimodal.extractFeatures(mixed, "media_id", "content", 8))
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // Half-black/half-white image ⇒ the luma histogram has exactly
    // half its mass in the bottom bin and half in the top bin — a
    // pixel-level fact no hash-derived stub reproduces.
    assert(math.abs(feats(1L).head - 0.5) < 1e-9)
    assert(math.abs(feats(1L).last - 0.5) < 1e-9)
    assert(feats(1L).slice(1, 7).forall(_ == 0.0))
    // Non-PNG row went down the stub path: values in [0,1), not a
    // two-spike histogram, and unchanged vs calling the stub directly.
    assert(feats(2L) ==
      Multimodal.FakeCodec.features("not a png".getBytes("UTF-8"), 8).toSeq)
  }

  test("resize on a real PNG re-encodes actual pixels at the target size") {
    val src = Seq((1L, "image", png(32, 16))).toDF("media_id", "kind", "content")
    val out = rows(Multimodal.resize(src, 8, 8)).head
    val resized = out.getAs[Array[Byte]]("content")
    assert(Multimodal.PngCodec.isPng(resized))
    val img = Multimodal.PngCodec.decode(resized).get
    assert(img.getWidth == 8 && img.getHeight == 8)
    // Pixel truth survives the resize: left edge dark, right edge light.
    val left = img.getRGB(0, 4) & 0xff
    val right = img.getRGB(7, 4) & 0xff
    assert(left < 64 && right > 192)
  }

  /** A PNG whose pixels follow a deterministic luma ramp with a
    * per-pixel wobble — structured enough that dHash has real
    * gradients to sign. */
  private def rampPng(w: Int, h: Int, wobble: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255,
        (x * 255 / math.max(1, w - 1) + ((x * 31 + y * 17) % 23) + wobble) % 256)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dhash: re-encoded PNG (same pixels, different bytes) hashes equal") {
    val original = rampPng(64, 48)
    // Re-encode: decode and write the SAME pixels back out — the byte
    // stream differs (encoder settings), a content hash misses it.
    val img = Multimodal.PngCodec.decode(original).get
    val bos = new java.io.ByteArrayOutputStream()
    val copy = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val g = copy.createGraphics()
    try g.drawImage(img, 0, 0, null) finally g.dispose()
    javax.imageio.ImageIO.write(copy, "png", bos)
    val reencoded = bos.toByteArray
    assert(!java.util.Arrays.equals(original, reencoded),
      "re-encode should change bytes for the test to mean anything")
    val df = Seq((1L, original), (2L, reencoded)).toDF("media_id", "content")
    val hs = rows(Multimodal.dhash(df, "media_id", "content"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
  }

  test("dhash: scaled copy stays near, different image lands far") {
    val base = rampPng(64, 48)
    val scaled = {
      val img = Multimodal.PngCodec.decode(base).get
      Multimodal.PngCodec.resize(img, 32, 24)
    }
    val other = png(64, 48) // half-black/half-white: one hard edge
    val df = Seq((1L, base), (2L, scaled), (3L, other))
      .toDF("media_id", "content")
    val hs = rows(Multimodal.dhash(df, "media_id", "content"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) <= 6,
      s"scaled copy drifted to Hamming ${ham(hs(1L), hs(2L))}")
    assert(ham(hs(1L), hs(3L)) > 10,
      s"unrelated image too close: Hamming ${ham(hs(1L), hs(3L))}")
  }

  /** The rampPng pixels re-encoded as JPEG — lossy twin of the PNG. */
  private def asJpeg(pngBytes: Array[Byte]): Array[Byte] = {
    val img = Multimodal.PngCodec.decode(pngBytes).get
    val rgb = new java.awt.image.BufferedImage(
      img.getWidth, img.getHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = rgb.createGraphics()
    try g.drawImage(img, 0, 0, null) finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "jpg", bos)
    bos.toByteArray
  }

  test("JPEG twin of a PNG is caught as an image near-dup (real decode)") {
    val png = rampPng(64, 48)
    val jpeg = asJpeg(png)
    assert(Multimodal.JpegCodec.isJpeg(jpeg) && !Multimodal.PngCodec.isPng(jpeg))
    assert(Multimodal.JpegCodec.decode(jpeg).isDefined)
    val media = Seq((1L, png), (2L, jpeg)).toDF("media_id", "content")
    val pairs = rows(Multimodal.imageNearDups(media, "media_id", "content"))
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, ham) => a == 1L && b == 2L && ham <= 6 },
      s"JPEG re-encode not caught: $pairs")
  }

  test("JPEG decode feeds real pixel features, not the stub") {
    val jpeg = asJpeg(rampPng(64, 48))
    val feats = rows(Multimodal.extractFeatures(
      Seq((1L, jpeg)).toDF("media_id", "content"), "media_id", "content", 8))
      .head.getSeq[Double](1)
    // Real luma histogram is L1-normalized (sums to 1); the stub's
    // pseudo-features are uniform hashes that essentially never do.
    assert(math.abs(feats.sum - 1.0) < 1e-9, s"stub features? $feats")
  }

  test("JpegFixture bytes decode to the pinned golden dhash") {
    val bytes = Multimodal.JpegFixture.hex.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(Multimodal.JpegCodec.isJpeg(bytes))
    val got = rows(Multimodal.dhash(
      Seq((1L, bytes)).toDF("media_id", "content"), "media_id", "content"))
      .head.getLong(1)
    assert(got == Multimodal.JpegFixture.dhash,
      s"decoder drift: got $got, pinned ${Multimodal.JpegFixture.dhash}")
  }

  test("corrupt jpeg-magic bytes fall through to the stub, not an error") {
    val corrupt = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      "garbage payload".getBytes("UTF-8")
    var expect = 0L
    val gray = Array.tabulate(72)(i =>
      (Multimodal.FakeCodec.channel(corrupt, i) % 256).toInt)
    for (r <- 0 until 8; c <- 0 until 8)
      expect = (expect << 1) | (if (gray(r * 9 + c) < gray(r * 9 + c + 1)) 1L else 0L)
    val got = rows(Multimodal.dhash(
      Seq((1L, corrupt)).toDF("media_id", "content"), "media_id", "content"))
      .head.getLong(1)
    assert(got == expect)
  }

  test("dhash: non-image content takes the deterministic stub grid") {
    val content = "not an image at all".getBytes("UTF-8")
    val got = rows(Multimodal.dhash(
      Seq((7L, content)).toDF("media_id", "content"), "media_id", "content"))
      .head.getLong(1)
    var expect = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      val l = Multimodal.FakeCodec.channel(content, r * 9 + c) % 256
      val rr = Multimodal.FakeCodec.channel(content, r * 9 + c + 1) % 256
      expect = (expect << 1) | (if (l < rr) 1L else 0L)
    }
    assert(got == expect)
  }

  test("imageNearDups: catches the re-encoded duplicate, not the stranger") {
    val a = rampPng(64, 48)
    val aCopy = { // decode + re-encode through resize at SAME dims
      val img = Multimodal.PngCodec.decode(a).get
      Multimodal.PngCodec.resize(img, 64, 48)
    }
    val b = png(64, 48)
    val df = Seq((1L, a), (2L, aCopy), (3L, b)).toDF("media_id", "content")
    val pairs = rows(Multimodal.imageNearDups(df, "media_id", "content",
        maxHamming = 6))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  /** 16-bit mono PCM WAV whose amplitude steps deterministically per
    * 250-sample chunk — a rich loudness envelope for fingerprinting
    * (`gain` scales the whole signal uniformly). */
  private def wavPattern(n: Int, seed: Int, gain: Double = 1.0): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bytes = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val a = gain * (0.1 + 0.8 * (((i / 250) * 37 + seed) % 97) / 97.0)
      val s = (a * 32767 * (if (i % 2 == 0) 1 else -1)).toInt.toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFingerprint: gain-invariant on real WAV, far for another signal") {
    val full = wavPattern(8250, seed = 5)
    val quiet = wavPattern(8250, seed = 5, gain = 0.5)
    val other = wavPattern(8250, seed = 41)
    assert(Multimodal.WavCodec.isWav(full))
    val df = Seq((1L, full), (2L, quiet), (3L, other))
      .toDF("media_id", "content")
    val fp = rows(Multimodal.audioFingerprint(df, "media_id", "content"))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L), "uniform gain must not change the fingerprint")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) > 3,
      s"unrelated signal too close: Hamming ${ham(fp(1L), fp(3L))}")
    assert(fp(1L) >= 0L && fp(1L) <= 0xffffffffL)
  }

  test("audioFingerprint: non-audio content takes the stub envelope") {
    val content = "definitely not audio".getBytes("UTF-8")
    val got = rows(Multimodal.audioFingerprint(
      Seq((9L, content)).toDF("media_id", "content"), "media_id", "content"))
      .head.getLong(1)
    val env = Multimodal.FakeCodec.features(content, 33)
    var expect = 0L
    for (i <- 0 until 32)
      expect = (expect << 1) | (if (env(i) < env(i + 1)) 1L else 0L)
    assert(got == expect)
  }

  test("audioNearDups: catches the re-leveled copy, not the stranger") {
    val a = wavPattern(8250, seed = 5)
    val aQuiet = wavPattern(8250, seed = 5, gain = 0.35)
    val b = wavPattern(8250, seed = 41)
    val df = Seq((1L, a), (2L, aQuiet), (3L, b)).toDF("media_id", "content")
    val pairs = rows(Multimodal.audioNearDups(df, "media_id", "content"))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  /** 16-bit mono PCM WAV: first half amplitude `a1`, second half `a2`
    * (constant-amplitude square-ish tone per half → exact RMS). */
  private def wav(n: Int, a1: Double, a2: Double): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bytes = new Array[Byte](n * 2)
    (0 until n).foreach { i =>
      val a = if (i < n / 2) a1 else a2
      val s = (a * 32767 * (if (i % 2 == 0) 1 else -1)).toInt.toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV content is decoded to PCM by javax.sound, not the stub") {
    val bytes = wav(8000, 0.5, 0.25)
    assert(Multimodal.WavCodec.isWav(bytes))
    val mixed = Seq(
      (1L, "audio", bytes),
      (2L, "audio", "RIFFxxxxWAVEgarbage-after-magic".getBytes("UTF-8")))
      .toDF("media_id", "kind", "content")
    val feats = rows(Multimodal.extractFeatures(mixed, "media_id", "content", 4))
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // Constant-amplitude halves ⇒ RMS envelope 0.5 then 0.25 — a
    // signal-level fact no hash-derived stub reproduces.
    assert(math.abs(feats(1L)(0) - 0.5) < 0.01)
    assert(math.abs(feats(1L)(1) - 0.5) < 0.01)
    assert(math.abs(feats(1L)(2) - 0.25) < 0.01)
    assert(math.abs(feats(1L)(3) - 0.25) < 0.01)
    // Bytes passing the magic check but failing decode fall through to
    // the stub instead of aborting the job.
    assert(feats(2L) == Multimodal.FakeCodec
      .features("RIFFxxxxWAVEgarbage-after-magic".getBytes("UTF-8"), 4).toSeq)
  }

  test("sniffType: real codec outputs, signature table, RIFF fmt split") {
    val cases = Seq(
      (1L, png(3, 3), "png"),               // real encoder output
      (2L, wav(100, 0.5, 0.5), "wav"),      // real RIFF/WAVE output
      (3L, "RIFFxxxxAVI LIST".getBytes("UTF-8"), "riff"), // RIFF, not WAVE
      (4L, Array(0xFF, 0xD8, 0xFF, 0xE1, 0x00).map(_.toByte), "jpeg"),
      (5L, "GIF89a-and-junk".getBytes("UTF-8"), "gif"),
      (6L, "%PDF-1.4 junk".getBytes("UTF-8"), "pdf"),
      (7L, Array(0x50, 0x4B, 0x03, 0x04, 0x14).map(_.toByte), "zip"),
      (8L, Array(0x1F, 0x8B, 0x08).map(_.toByte), "gzip"),
      (9L, "plain text".getBytes("UTF-8"), "unknown"),
      (10L, Array.empty[Byte], "unknown"),
      // structural guards: text that merely STARTS with a
      // text-shaped magic (BM / ID3 / ftyp-at-5) must stay unknown…
      (11L, "BMW sales rose".getBytes("UTF-8"), "unknown"),
      (12L, "ID3 tags intro".getBytes("UTF-8"), "unknown"),
      (13L, "abcdftyp text".getBytes("UTF-8"), "unknown"),
      // …while the real fixtures (zeroed reserved field, v2.4
      // version byte, small box size) classify.
      (14L, Multimodal.BmpFixture.bytes, "bmp"),
      (15L, Multimodal.Mp3Fixture.bytes, "mp3"),
      (16L, Multimodal.Mp4Fixture.bytes, "mp4"),
      // 'fLaC' followed by printable text stays unknown (the block
      // header byte is the structural guard); TIFF magics embed a
      // NUL so no text case exists.
      (17L, "fLaC rips sound great".getBytes("UTF-8"), "unknown"),
      (18L, Multimodal.FlacFixture.bytes, "flac"),
      (19L, Multimodal.TiffFixture.bytes, "tiff"),
      (20L, Multimodal.TiffFixture.beBytes, "tiff"))
    val got = cases.toDF("id", "content", "expect")
      .select(col("id"), Multimodal.sniffType(col("content")).as("kind"),
        col("expect"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(2), r))
  }

  test("GifFixture decodes to the quadrant pattern and locks the dhash") {
    val px = for (y <- 0 until 16; x <- 0 until 16) yield {
      val bright = (x < 8) ^ (y < 8)
      if (bright) 0xffc86428 else 0xff28c89b
    }
    val img = Multimodal.GifCodec.decode(Multimodal.GifFixture.bytes).get
    assert(img.getRGB(0, 0, 16, 16, null, 0, 16).toSeq == px)
    assert(Multimodal.dhashOf(Multimodal.grayGridFor(
      Multimodal.GifFixture.bytes)) == Multimodal.WebpFixture.dhash)
    // magic-passing garbage falls cleanly to None
    val corrupt = "GIF89a".getBytes("ISO-8859-1") ++
      Array.fill(30)(0x41.toByte)
    assert(Multimodal.GifCodec.isGif(corrupt))
    assert(Multimodal.GifCodec.decode(corrupt).isEmpty)
  }

  test("BmpFixture decodes to the quadrant pattern and locks the dhash") {
    val px = for (y <- 0 until 16; x <- 0 until 16) yield {
      val bright = (x < 8) ^ (y < 8)
      if (bright) 0xffc86428 else 0xff28c89b
    }
    val img = Multimodal.BmpCodec.decode(Multimodal.BmpFixture.bytes).get
    assert(img.getRGB(0, 0, 16, 16, null, 0, 16).toSeq == px)
    assert(Multimodal.dhashOf(Multimodal.grayGridFor(
      Multimodal.BmpFixture.bytes)) == Multimodal.WebpFixture.dhash)
    val corrupt = "BM".getBytes("ISO-8859-1") ++
      Array.fill(30)(0x41.toByte)
    assert(Multimodal.BmpCodec.isBmp(corrupt))
    assert(Multimodal.BmpCodec.decode(corrupt).isEmpty)
  }

  test("Mp4Codec: fixture metadata, v1 mvhd, malformed quarantines") {
    assert(Multimodal.Mp4Codec.parseMeta(Multimodal.Mp4Fixture.bytes)
      .contains(("isom", 1000L, 5500L, 5500L)))

    // v1 mvhd: 64-bit times/duration, timescale 90000, 3.5 s
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("ISO-8859-1"))
        .put(payload)
      bb.array()
    }
    val mvhd1 = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 4 + 8)
      bb.putInt(0x01000000)         // version 1, flags 0
        .putLong(0L).putLong(0L)    // creation / modification
        .putInt(90000)              // timescale
        .putLong(315000L)           // duration -> 3500 ms
      bb.array()
    }
    val v1 = box("ftyp", "mp42____".getBytes("ISO-8859-1")) ++
      box("moov", box("mvhd", mvhd1))
    assert(Multimodal.Mp4Codec.parseMeta(v1)
      .contains(("mp42", 90000L, 315000L, 3500L)))

    // truncated ftyp (no brand), missing moov, oversize box: all None
    val bareFtyp = Array[Byte](0, 0, 0, 8, 'f', 't', 'y', 'p')
    assert(Multimodal.Mp4Codec.parseMeta(
      bareFtyp ++ "garbage-tail".getBytes("ISO-8859-1")).isEmpty)
    assert(Multimodal.Mp4Codec.parseMeta(
      box("ftyp", "isom0000".getBytes("ISO-8859-1"))).isEmpty)
    val oversize = box("ftyp", "isom0000".getBytes("ISO-8859-1")) ++
      Array[Byte](0x7f, -1, -1, -1, 'm', 'o', 'o', 'v')
    assert(Multimodal.Mp4Codec.parseMeta(oversize).isEmpty)
    assert(!Multimodal.Mp4Codec.isMp4("plain text here".getBytes))
  }

  test("videoMeta: NULL quarantine for non-video rows, real parse for mp4") {
    val rows = Seq(
      (1L, Multimodal.Mp4Fixture.bytes),
      (2L, "not a video at all".getBytes("ISO-8859-1")),
      (3L, Array[Byte](0, 0, 0, 8, 'f', 't', 'y', 'p')))
    val df = spark.createDataFrame(rows).toDF("media_id", "content")
    val got = Multimodal.videoMeta(df, "media_id", "content").collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(got(1L).getAs[String]("brand") == "isom")
    assert(got(1L).getAs[Long]("duration_ms") == 5500L)
    assert(got(2L).isNullAt(got(2L).fieldIndex("brand")))
    assert(got(3L).isNullAt(got(3L).fieldIndex("duration_ms")))
  }

  test("Mp3Codec: fixture walks exactly, strict quarantine on every corruption") {
    import Multimodal.{Mp3Codec, Mp3Fixture}
    // (tag 20, 4 frames, 128 kbps, 44100 Hz, floor(4·1152·1000/44100))
    assert(Mp3Codec.parseMeta(Mp3Fixture.bytes)
      .contains((20L, 4L, 128L, 44100L, 104L)))
    // Bare stream (no ID3): the frames alone parse with tag 0.
    assert(Mp3Codec.parseMeta(Mp3Fixture.bytes.drop(20))
      .contains((0L, 4L, 128L, 44100L, 104L)))
    // Truncated final frame → None (strict walk, no partial census).
    assert(Mp3Codec.parseMeta(Mp3Fixture.bytes.dropRight(1)).isEmpty)
    // Trailing garbage after the last frame → None.
    assert(Mp3Codec.parseMeta(Mp3Fixture.bytes :+ 0x00.toByte).isEmpty)
    // Bad bitrate index (15) in frame 1 → None.
    val badBr = Mp3Fixture.bytes.clone()
    badBr(22) = 0xf0.toByte
    assert(Mp3Codec.parseMeta(badBr).isEmpty)
    // Reserved samplerate (idx 3) → None.
    val badSr = Mp3Fixture.bytes.clone()
    badSr(22) = 0x9c.toByte
    assert(Mp3Codec.parseMeta(badSr).isEmpty)
    // Syncsafe violation (bit 7 set in a size byte) → None.
    val badTag = Mp3Fixture.bytes.clone()
    badTag(9) = 0x8a.toByte
    assert(Mp3Codec.parseMeta(badTag).isEmpty)
    // Tag size past the buffer → None.
    assert(Mp3Codec.parseMeta(
      "ID3     padding"
        .getBytes("ISO-8859-1")).isEmpty)
    // Not MP3 at all → None.
    assert(Mp3Codec.parseMeta("hello".getBytes).isEmpty)
  }

  test("FlacCodec: fixture walks exactly, strict quarantine on corruption") {
    import Multimodal.{FlacCodec, FlacFixture}
    assert(FlacCodec.parseMeta(FlacFixture.bytes)
      .contains((44100L, 2L, 16L, 4410L, 100L)))
    // Magic + STREAMINFO header byte + text: block length runs past
    // the buffer → None.
    assert(FlacCodec.parseMeta(
      ("fLaC " + "not really audio").getBytes("ISO-8859-1"))
      .isEmpty)
    // Truncated STREAMINFO → None.
    assert(FlacCodec.parseMeta(FlacFixture.bytes.dropRight(1)).isEmpty)
    // First block not STREAMINFO (type 4 = VORBIS_COMMENT) → None.
    val wrongType = FlacFixture.bytes.clone()
    wrongType(4) = 0x84.toByte
    assert(FlacCodec.parseMeta(wrongType).isEmpty)
    // Zero sample rate → None.
    val zeroRate = FlacFixture.bytes.clone()
    zeroRate(18) = 0; zeroRate(19) = 0; zeroRate(20) = 0x0f
    assert(FlacCodec.parseMeta(zeroRate).isEmpty)
    // Plain text / too short → None.
    assert(FlacCodec.parseMeta("fLa".getBytes).isEmpty)
    assert(FlacCodec.parseMeta("plain text".getBytes).isEmpty)
  }

  test("GzipCodec: real inflate with ISIZE verification, strict quarantine") {
    import Multimodal.{GzipCodec, GzipFixture}
    // mtime 0, 148-byte payload, ISIZE verified against the inflate.
    assert(GzipCodec.parseMeta(GzipFixture.bytes)
      .contains((0L, 148L, 148L)))
    // Magic + CM + text: inflate fails -> None.
    assert(GzipCodec.parseMeta(
      (Array[Byte](0x1f, 0x8b.toByte, 0x08) ++
        "plain text body here".getBytes("UTF-8"))).isEmpty)
    // Truncated member -> None.
    assert(GzipCodec.parseMeta(GzipFixture.bytes.dropRight(5)).isEmpty)
    // Tampered ISIZE: inflate succeeds but the trailer lies -> None.
    val bad = GzipFixture.bytes.clone()
    bad(bad.length - 4) = 0x01
    assert(GzipCodec.parseMeta(bad).isEmpty)
    assert(GzipCodec.parseMeta("not gzip".getBytes).isEmpty)
  }

  test("TiffCodec: LE and BE fixtures parse, malformed quarantines") {
    import Multimodal.{TiffCodec, TiffFixture}
    assert(TiffCodec.parseDims(TiffFixture.bytes)
      .contains(("II", 16L, 16L)))
    assert(TiffCodec.parseDims(TiffFixture.beBytes)
      .contains(("MM", 16L, 16L)))
    // Magic + text: the IFD offset read from text bytes lands far
    // past the buffer → None.
    assert(TiffCodec.parseDims(
      (Array[Byte]('I', 'I', 0x2a, 0) ++
        "the quick brown fox".getBytes("UTF-8"))).isEmpty)
    // Width entry removed (tag overwritten) → None.
    val noWidth = TiffFixture.bytes.clone()
    noWidth(10) = 0x11 // tag 256 -> 273 (StripOffsets)
    assert(TiffCodec.parseDims(noWidth).isEmpty)
    // IFD entry table runs past the buffer → None.
    val bigCount = TiffFixture.bytes.clone()
    bigCount(8) = 0x40
    assert(TiffCodec.parseDims(bigCount).isEmpty)
    assert(TiffCodec.parseDims("plain".getBytes).isEmpty)
  }
}
