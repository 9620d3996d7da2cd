package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decoder locks over REAL-WORLD media files (src/test/resources/
  * organic — see its README for provenance): interlaced PNG, 4-bit
  * palette PNG, gray+alpha PNG, progressive JPEG, GIF89a, and
  * stdlib-python-encoded WAV. The synthetic in-query fixtures pin
  * exact bytes; these pin the decode BOUNDARY on inputs this repo's
  * own encoders never produced — the edge cases (interlace passes,
  * progressive scans, palette expansion, PCM8→PCM16 conversion) a
  * crawl corpus hits on day one. */
class OrganicMediaSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/organic/$name")
    assert(in != null, s"missing organic fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val imageDims = Seq(
    // (file, width, height) — dims read independently (python struct
    // over the PNG IHDR / GIF logical-screen descriptor / JPEG SOF).
    ("png_palette4.png", 914, 508),
    ("png_palette8.png", 48, 48),
    ("png_gray_alpha.png", 48, 48),
    ("png_rgba.png", 48, 48),
    ("png_rgb.png", 2158, 178),
    ("png_interlaced.png", 91, 69),
    ("jpeg_progressive.jpg", 493, 312),
    ("jpeg_progressive_thin.jpg", 493, 58),
    ("gif_logo64.gif", 43, 64),
    ("gif_logo75.gif", 48, 75))

  test("organic images decode to real pixels at their exact dims") {
    imageDims.foreach { case (name, w, h) =>
      val img = Multimodal.decodeImage(fixture(name))
      assert(img.isDefined, s"$name fell through to the stub")
      assert(img.get.getWidth == w && img.get.getHeight == h,
        s"$name: got ${img.get.getWidth}x${img.get.getHeight}, " +
          s"want ${w}x$h")
    }
  }

  test("organic images: luma-histogram features are a real distribution") {
    imageDims.foreach { case (name, _, _) =>
      val img = Multimodal.decodeImage(fixture(name)).get
      val f = Multimodal.PngCodec.features(img, 16)
      assert(math.abs(f.sum - 1.0) < 1e-9, s"$name histogram sum ${f.sum}")
      assert(f.forall(v => v >= 0.0 && v <= 1.0))
    }
  }

  test("organic images: dhash is deterministic and format-honest") {
    val rows = imageDims.zipWithIndex.map { case ((name, _, _), i) =>
      (i.toLong, fixture(name))
    }
    val df = rows.toDF("media_id", "content")
    val once = Multimodal.dhash(df, "media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val twice = Multimodal.dhash(df, "media_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(once == twice)
    assert(once.size == imageDims.size)
  }

  test("organic bytes sniff to their true formats") {
    val rows = (imageDims.map(_._1) ++
      Seq("wav_pcm16_mono.wav", "wav_pcm8_stereo.wav"))
      .map(n => (n, fixture(n)))
    val got = rows.toDF("name", "content")
      .select(col("name"), Multimodal.sniffType(col("content")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    rows.map(_._1).foreach { n =>
      val want =
        if (n.startsWith("png")) "png"
        else if (n.startsWith("jpeg")) "jpeg"
        else if (n.startsWith("gif")) "gif"
        else "wav"
      assert(got(n) == want, s"$n sniffed as ${got(n)}")
    }
  }

  test("organic gzip: GNU-gzip members parse with verified ISIZE") {
    // Two encoders this repo never ran: Debian's normalized gzip
    // (FLG=0, MTIME=0 — reproducible-build style) and GNU gzip -9
    // with FNAME+MTIME set (the header-walk path GZIPInputStream must
    // skip). Expected values pinned from python gzip/struct over the
    // committed bytes.
    val deb = Multimodal.GzipCodec.parseMeta(
      fixture("gzip_debian_changelog.gz"))
    assert(deb.contains((0L, 10590L, 10590L)), s"debian: $deb")
    val gnu = Multimodal.GzipCodec.parseMeta(
      fixture("gzip_gnu_fname.gz"))
    assert(gnu.contains((1786867075L, 35149L, 35149L)), s"gnu: $gnu")
    // FLG bit 3 (FNAME) really is set on the GNU member — the
    // variety this fixture exists for.
    assert((fixture("gzip_gnu_fname.gz")(3) & 0x08) != 0)
    // Truncation quarantines (ISIZE/inflate can no longer agree).
    val cut = fixture("gzip_gnu_fname.gz").dropRight(7)
    assert(Multimodal.GzipCodec.parseMeta(cut).isEmpty)
    // And the DataFrame boundary carries all of it.
    val got = Multimodal.gzipMeta(
      Seq((1L, fixture("gzip_debian_changelog.gz")),
        (2L, fixture("gzip_gnu_fname.gz")), (3L, cut))
        .toDF("media_id", "content"),
      "media_id", "content")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map(1L -> 10590L, 2L -> 35149L, 3L -> -1L))
  }

  test("independent-encoder TIFF: ImageIO-written files parse dims") {
    // TiffCodec.parseDims is a from-scratch IFD walker; the JDK
    // ImageIO TIFF WRITER is an encoder independent of it (this repo
    // only ever built TIFF bytes by hand). Odd dimensions + both RGB
    // and gray layouts + LZW compression exercise real tag layouts
    // (type SHORT vs LONG, extra tags interleaved) that the pinned
    // hand fixture cannot.
    def imageioTiff(w: Int, h: Int, gray: Boolean,
        compression: Option[String]): Array[Byte] = {
      val tpe = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_INT_RGB
      val img = new java.awt.image.BufferedImage(w, h, tpe)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.setRGB(x, y, (x * 53 + y * 31) % 256 * 0x010101)))
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
      assert(it.hasNext, "JDK TIFF writer missing")
      val writer = it.next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      compression.foreach { c =>
        param.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(c)
      }
      writer.write(null,
        new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    val cases = Seq(
      (37, 23, false, None),
      (48, 48, true, None),
      (61, 17, false, Some("LZW")),
      (16, 16, true, Some("Deflate")))
    cases.foreach { case (w, h, gray, comp) =>
      val bytes = imageioTiff(w, h, gray, comp)
      assert(Multimodal.TiffCodec.isTiff(bytes),
        s"${w}x$h $comp not sniffed as TIFF")
      val dims = Multimodal.TiffCodec.parseDims(bytes)
      assert(dims.isDefined, s"${w}x$h gray=$gray comp=$comp: " +
        "parseDims fell through")
      val (order, gw, gh) = dims.get
      assert((order == "II" || order == "MM") && gw == w && gh == h,
        s"${w}x$h comp=$comp: got $dims")
    }
  }

  test("organic gzip + imageio tiff sniff to their true formats") {
    val rows = Seq(
      ("gzip_debian_changelog.gz", fixture("gzip_debian_changelog.gz")),
      ("gzip_gnu_fname.gz", fixture("gzip_gnu_fname.gz")))
    val got = rows.toDF("name", "content")
      .select(col("name"), Multimodal.sniffType(col("content")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.values.toSet == Set("gzip"), got.toString)
  }

  test("organic WAVs decode to exact sample counts and rates") {
    val mono = Multimodal.WavCodec.decode(fixture("wav_pcm16_mono.wav"))
    assert(mono.isDefined, "PCM16 mono fell through to the stub")
    val (rate1, s1) = mono.get
    assert(rate1 == 8000 && s1.length == 2000)
    // 440 Hz sine at amplitude 20000/32768 — RMS ≈ 0.61/√2 ≈ 0.43.
    val rms = math.sqrt(s1.map(v => v * v).sum / s1.length)
    assert(rms > 0.40 && rms < 0.46, s"mono RMS $rms")
    val stereo =
      Multimodal.WavCodec.decode(fixture("wav_pcm8_stereo.wav"))
    assert(stereo.isDefined, "PCM8 stereo fell through to the stub")
    val (rate2, s2) = stereo.get
    assert(rate2 == 11025 && s2.length == 1500)
    assert(s2.forall(v => v >= -1.0 && v <= 1.0))
  }
}
