package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Decoder-lock tests for [[Vp8lCodec]] built on a minimal VP8L
  * ENCODER written directly from the spec (RFC 9649): the encoder
  * knows nothing about the decoder's internals — both sides derive
  * independently from the published bitstream rules (canonical
  * prefix-code assignment, LSB-first bit packing, LZ77 value coding),
  * so a roundtrip failure means one of them misreads the spec.
  * Covered paths: simple 1/2-symbol codes, normal codes via the
  * code-length code (incl. zero-runs 17/18 and the max_symbol early
  * stop), color cache hits, LZ77 backrefs through both the direct
  * (code > 120) and neighborhood (code ≤ 120) distance forms,
  * subtract-green, predictor and color transforms, palette indexing
  * with sub-byte bundling, and the corrupt-bytes → None guarantee. */
class Vp8lSpec extends AnyFunSuite {

  // ── minimal spec-first encoder ─────────────────────────────────
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var n = 0
    def put(v: Int, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { buf += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
    }
    /** Prefix-code bits are read MSB-of-code first. */
    def putCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      val out = buf.clone()
      if (n > 0) out += cur.toByte
      out.toArray
    }
  }

  /** DEFLATE-style canonical code assignment (mirrors the spec's
    * build rule, independently of the decoder's implementation). */
  private def canonical(lengths: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val maxLen = 15
    val blCount = new Array[Int](maxLen + 1)
    lengths.values.foreach(l => blCount(l) += 1)
    var code = 0
    val next = new Array[Int](maxLen + 1)
    for (l <- 1 to maxLen) { code = (code + blCount(l - 1)) << 1; next(l) = code }
    lengths.toSeq.sortBy(_._1).map { case (sym, l) =>
      val c = next(l); next(l) += 1; sym -> (c, l)
    }.toMap
  }

  /** Emit a prefix code: simple form for ≤2 symbols (all length ≤1),
    * else the normal form through the code-length code. Returns the
    * symbol → (code, len) table for data emission. */
  private def writePrefix(
      bw: BitWriter, lengths: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val syms = lengths.keys.toSeq.sorted
    if (syms.size <= 2 && syms.forall(_ < 256)) {
      bw.put(1, 1) // simple
      bw.put(syms.size - 1, 1)
      bw.put(1, 1) // first symbol in 8 bits
      bw.put(syms.head, 8)
      if (syms.size == 2) bw.put(syms(1), 8)
      if (syms.size == 1) Map(syms.head -> (0, 0))
      else Map(syms.head -> (0, 1), syms(1) -> (1, 1))
    } else {
      bw.put(0, 1) // normal
      bw.put(15, 4) // num_code_lengths = 19
      // code-length code: uniform-length canonical over the CL
      // symbols we will emit (the lengths in use, 0 for gaps, 17/18
      // for zero runs).
      val zeroRuns = syms.max > syms.size // any gaps at all?
      val clSyms = (lengths.values.toSet ++ Set(0) ++
        (if (zeroRuns) Set(17, 18) else Set.empty[Int])).toSeq.sorted
      val clLen = math.max(1,
        32 - Integer.numberOfLeadingZeros(clSyms.size - 1))
      val clTable = canonical(clSyms.map(_ -> clLen).toMap)
      val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
        11, 12, 13, 14, 15)
      order.foreach(s => bw.put(if (clSyms.contains(s)) clLen else 0, 3))
      // emissions: walk 0..max symbol, zeros via 17/18 runs
      val emissions = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, Int)] // (clSym, extraVal, extraBits)
      var s = 0
      while (s <= syms.max) {
        lengths.get(s) match {
          case Some(l) => emissions += ((l, 0, 0)); s += 1
          case None =>
            var run = 0
            while (s + run <= syms.max && !lengths.contains(s + run)) run += 1
            while (run > 0) {
              if (run >= 11) {
                val take = math.min(run, 138)
                emissions += ((18, take - 11, 7)); run -= take; s += take
              } else if (run >= 3) {
                emissions += ((17, run - 3, 3)); s += run; run = 0
              } else {
                emissions += ((0, 0, 0)); s += 1; run -= 1
              }
            }
        }
      }
      // max_symbol = number of CL reads, via the 16-bit length form
      bw.put(1, 1)
      bw.put(7, 3)
      bw.put(emissions.size - 2, 16)
      emissions.foreach { case (cl, ev, eb) =>
        val (c, l) = clTable(cl)
        bw.putCode(c, l)
        if (eb > 0) bw.put(ev, eb)
      }
      canonical(lengths)
    }
  }

  /** Kraft-COMPLETE length assignment for d symbols: 2^k − r codes of
    * length k and 2r of k+1 (r = d − 2^k) sum to exactly 1 — a spec-
    * valid code, not merely one this decoder happens to accept. */
  private def lengthsFor(values: Seq[Int]): Map[Int, Int] = {
    val d = values.distinct.sorted
    if (d.size == 1) Map(d.head -> 1)
    else {
      val k = 31 - Integer.numberOfLeadingZeros(d.size)
      val r = d.size - (1 << k)
      d.zipWithIndex.map { case (s, i) =>
        s -> (if (i < (1 << k) - r) k else k + 1)
      }.toMap
    }
  }

  private def riff(payload: Array[Byte]): Array[Byte] = {
    val chunk = 0x2f.toByte +: payload
    val pad = if (chunk.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    "RIFF".getBytes("ISO-8859-1") ++ le32(4 + 8 + chunk.length + pad.length) ++
      "WEBP".getBytes("ISO-8859-1") ++ "VP8L".getBytes("ISO-8859-1") ++
      le32(chunk.length) ++ chunk ++ pad
  }

  private case class Sym(green: Int, red: Int, blue: Int, alpha: Int)
  private def symOf(p: Int) =
    Sym((p >> 8) & 0xff, (p >> 16) & 0xff, p & 0xff, p >>> 24)

  /** Encode literal pixels (an optional transform-bits prefix is the
    * caller's job via `pre`). `greenExtra` adds non-literal symbols
    * (length/cache codes) the caller will emit via the returned
    * tables. */
  private def encodeBody(
      bw: BitWriter, pixels: Seq[Int], cacheBits: Int = 0,
      greenExtra: Seq[Int] = Nil, distSyms: Seq[Int] = Seq(0),
      main: Boolean = true)
      : (Map[Int, (Int, Int)], Map[Int, (Int, Int)], Map[Int, (Int, Int)],
         Map[Int, (Int, Int)], Map[Int, (Int, Int)]) = {
    if (cacheBits > 0) { bw.put(1, 1); bw.put(cacheBits, 4) }
    else bw.put(0, 1)
    // entropy-coded SUB-images carry no meta-prefix field
    if (main) bw.put(0, 1) // no meta prefix
    val syms = pixels.map(symOf)
    val g = writePrefix(bw, lengthsFor(syms.map(_.green) ++ greenExtra))
    val r = writePrefix(bw, lengthsFor(syms.map(_.red)))
    val b = writePrefix(bw, lengthsFor(syms.map(_.blue)))
    val a = writePrefix(bw, lengthsFor(syms.map(_.alpha)))
    val d = writePrefix(bw, lengthsFor(distSyms))
    (g, r, b, a, d)
  }

  private def putLiteral(bw: BitWriter, p: Int,
      t: (Map[Int, (Int, Int)], Map[Int, (Int, Int)], Map[Int, (Int, Int)],
          Map[Int, (Int, Int)], Map[Int, (Int, Int)])): Unit = {
    val s = symOf(p)
    val (gc, gl) = t._1(s.green); bw.putCode(gc, gl)
    val (rc, rl) = t._2(s.red); bw.putCode(rc, rl)
    val (bc, bl) = t._3(s.blue); bw.putCode(bc, bl)
    val (ac, al) = t._4(s.alpha); bw.putCode(ac, al)
  }

  /** Plain literal image, optional leading transform bits. */
  private def encodeLiterals(
      w: Int, h: Int, pixels: Seq[Int],
      pre: BitWriter => Unit = _.put(0, 1)): Array[Byte] = {
    val bw = new BitWriter
    bw.put(w - 1, 14); bw.put(h - 1, 14); bw.put(0, 1); bw.put(0, 3)
    pre(bw)
    val t = encodeBody(bw, pixels)
    pixels.foreach(putLiteral(bw, _, t))
    riff(bw.bytes)
  }

  private def decodePx(bytes: Array[Byte]): Array[Int] = {
    val img = Vp8lCodec.decode(bytes).get
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
  }

  // quadrant test pattern: two values per channel
  private def quadrants(w: Int, h: Int): Seq[Int] =
    for (y <- 0 until h; x <- 0 until w) yield {
      val bright = (x < w / 2) ^ (y < h / 2)
      if (bright) 0xffc86428 else 0xff28c89b
    }

  test("simple codes: quadrant image roundtrips exactly") {
    val px = quadrants(16, 16)
    assert(decodePx(encodeLiterals(16, 16, px)).toSeq == px)
  }

  test("container: sniff, VP8X-style later chunk, corrupt bytes") {
    val good = encodeLiterals(16, 16, quadrants(16, 16))
    assert(Vp8lCodec.isWebp(good) && Vp8lCodec.isWebpLossless(good))
    // magic-passing garbage must fail CLEANLY (stub fallback), not throw
    val corrupt = good.take(24) ++ Array.fill(40)(0x5a.toByte)
    assert(Vp8lCodec.isWebp(corrupt))
    assert(Vp8lCodec.decode(corrupt).isEmpty)
    assert(Vp8lCodec.decode("RIFFxxxxWEBP".getBytes("ISO-8859-1")).isEmpty)
    // a preceding unknown chunk: the walk must still find VP8L
    val extra = "XTRA".getBytes("ISO-8859-1") ++
      Array[Byte](2, 0, 0, 0, 7, 7) ++ good.drop(12)
    val wrapped = good.take(12) ++ extra
    assert(Vp8lCodec.decode(wrapped).isDefined)
  }

  test("normal codes: >2 symbols per channel roundtrip (gradient)") {
    val w = 8; val h = 8
    val px = for (y <- 0 until h; x <- 0 until w)
      yield 0xff000000 | ((x * 32) << 16) | ((y * 32) << 8) | ((x + y) * 16)
    assert(decodePx(encodeLiterals(w, h, px)).toSeq == px.toSeq)
  }

  test("subtract-green transform inverts") {
    val px = quadrants(16, 16)
    val residuals = px.map { p =>
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) - g) & 0xff
      val b = ((p & 0xff) - g) & 0xff
      (p & 0xff00ff00) | (r << 16) | b
    }
    val bytes = encodeLiterals(16, 16, residuals,
      pre = { bw => bw.put(1, 1); bw.put(2, 2); bw.put(0, 1) })
    assert(decodePx(bytes).toSeq == px)
  }

  test("predictor transform (one block, left mode) inverts") {
    val w = 16; val h = 16
    val px = Seq.fill(w * h)(0xff5a9b3c) // uniform: left-residuals are 0
    val residuals = px.zipWithIndex.map { case (p, i) =>
      val pred =
        if (i == 0) 0xff000000
        else if (i < w) px(i - 1)
        else if (i % w == 0) px(i - w)
        else px(i - 1) // mode 1: left
      // channel-wise subtraction mod 256
      val a = (((p >>> 24) - (pred >>> 24)) & 0xff) << 24
      val r = ((((p >> 16) & 0xff) - ((pred >> 16) & 0xff)) & 0xff) << 16
      val g = ((((p >> 8) & 0xff) - ((pred >> 8) & 0xff)) & 0xff) << 8
      val b = ((p & 0xff) - (pred & 0xff)) & 0xff
      a | r | g | b
    }
    val bw = new BitWriter
    bw.put(w - 1, 14); bw.put(h - 1, 14); bw.put(0, 1); bw.put(0, 3)
    bw.put(1, 1); bw.put(0, 2) // predictor transform
    bw.put(2, 3) // size_bits = 4 → one 16×16 block
    // 1×1 sub-image: mode 1 in the green channel
    val subT = encodeBody(bw, Seq(0xff000100), main = false)
    putLiteral(bw, 0xff000100, subT)
    bw.put(0, 1) // no more transforms
    val t = encodeBody(bw, residuals)
    residuals.foreach(putLiteral(bw, _, t))
    assert(decodePx(riff(bw.bytes)).toSeq == px)
  }

  test("color transform inverts") {
    val w = 8; val h = 8
    // one block; cte: g2r=+3, g2b=-2 (254), r2b=+1 in (b,g,r) channels
    val cte = 0xff000000 | (1 << 16) | (254 << 8) | 3
    def delta(t: Int, c: Int) = (t.toByte * c.toByte) >> 5
    val wanted = for (y <- 0 until h; x <- 0 until w)
      yield 0xff000000 | ((x * 30 + 10) << 16) | ((y * 30 + 5) << 8) | (x * 20 + y)
    // forward transform (what an encoder stores)
    val residuals = wanted.map { p =>
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) - delta(3, g)) & 0xff
      val b0 = ((p & 0xff) - delta(254, g)) & 0xff
      val b = (b0 - delta(1, (((p >> 16) & 0xff)))) & 0xff
      (p & 0xff00ff00) | (r << 16) | b
    }
    val bw = new BitWriter
    bw.put(w - 1, 14); bw.put(h - 1, 14); bw.put(0, 1); bw.put(0, 3)
    bw.put(1, 1); bw.put(1, 2) // color transform
    bw.put(1, 3) // size_bits = 3 → one 8×8 block
    val subT = encodeBody(bw, Seq(cte), main = false)
    putLiteral(bw, cte, subT)
    bw.put(0, 1)
    val t = encodeBody(bw, residuals)
    residuals.foreach(putLiteral(bw, _, t))
    assert(decodePx(riff(bw.bytes)).toSeq == wanted.toSeq)
  }

  test("color cache: alternating pixels hit the cache") {
    val w = 16; val h = 1
    val a = 0xff102030; val b = 0xffd0e0f0
    val cacheBits = 4
    def slot(p: Int) = (0x1e35a7bd * p) >>> (32 - cacheBits)
    assert(slot(a) != slot(b)) // distinct cache slots by construction
    val bw = new BitWriter
    bw.put(w - 1, 14); bw.put(h - 1, 14); bw.put(0, 1); bw.put(0, 3)
    bw.put(0, 1) // no transforms
    val cacheA = 280 + slot(a); val cacheB = 280 + slot(b)
    val t = encodeBody(bw, Seq(a, b), cacheBits = cacheBits,
      greenExtra = Seq(cacheA, cacheB))
    putLiteral(bw, a, t)
    putLiteral(bw, b, t)
    (2 until w).foreach { i =>
      val (c, l) = t._1(if (i % 2 == 0) cacheA else cacheB)
      bw.putCode(c, l)
    }
    val want = (0 until w).map(i => if (i % 2 == 0) a else b)
    assert(decodePx(riff(bw.bytes)).toSeq == want)
  }

  private def lz77SymExtra(value: Int): (Int, Int, Int) = {
    if (value <= 4) (value - 1, 0, 0)
    else {
      var c = 4
      while ({
        val extra = (c - 2) >> 1
        val offset = (2 + (c & 1)) << extra
        !(value > offset && value <= offset + (1 << extra))
      }) c += 1
      val extra = (c - 2) >> 1
      val offset = (2 + (c & 1)) << extra
      (c, value - offset - 1, extra)
    }
  }

  test("LZ77: direct distance (code > 120) and neighborhood (0,1)") {
    val w = 8; val h = 2
    val row = (0 until w).map(x => 0xff000000 | ((x * 16) << 16) |
      ((x * 8) << 8) | (255 - x * 16))
    for (direct <- Seq(true, false)) {
      val distValue = if (direct) w + 120 else 1 // (0,1) maps to w
      val (dSym, dExtraVal, dExtraBits) = lz77SymExtra(distValue)
      val (lSym, lExtraVal, lExtraBits) = lz77SymExtra(w) // length = w
      val bw = new BitWriter
      bw.put(w - 1, 14); bw.put(h - 1, 14); bw.put(0, 1); bw.put(0, 3)
      bw.put(0, 1)
      val t = encodeBody(bw, row, greenExtra = Seq(256 + lSym),
        distSyms = Seq(dSym))
      row.foreach(putLiteral(bw, _, t))
      val (lc, ll) = t._1(256 + lSym)
      bw.putCode(lc, ll)
      if (lExtraBits > 0) bw.put(lExtraVal, lExtraBits)
      val (dc, dl) = t._5(dSym)
      bw.putCode(dc, dl)
      if (dExtraBits > 0) bw.put(dExtraVal, dExtraBits)
      assert(decodePx(riff(bw.bytes)).toSeq == (row ++ row),
        s"direct=$direct")
    }
  }

  test("palette indexing with sub-byte bundling inverts") {
    val w = 16; val h = 4
    val palette = Seq(0xff111111, 0xff22aa44, 0xff3366cc, 0xffddeeff)
    val idx = for (y <- 0 until h; x <- 0 until w) yield (x + y) % 4
    val want = idx.map(palette(_))
    // palette_size 4 → width_bits 2 → 4 px per green byte, packedW 4
    val packedW = 4
    val packed = for (y <- 0 until h; px <- 0 until packedW) yield {
      var g = 0
      for (j <- 0 until 4) g |= idx(y * w + px * 4 + j) << (2 * j)
      0xff000000 | (g << 8)
    }
    val bw = new BitWriter
    bw.put(w - 1, 14); bw.put(h - 1, 14); bw.put(0, 1); bw.put(0, 3)
    bw.put(1, 1); bw.put(3, 2) // color indexing
    bw.put(3, 8) // palette_size − 1
    // palette sub-image: delta-coded entries
    val deltas = palette.zipWithIndex.map { case (p, i) =>
      if (i == 0) p
      else {
        val q = palette(i - 1)
        def ch(sh: Int) = (((p >>> sh) & 0xff) - ((q >>> sh) & 0xff)) & 0xff
        (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
      }
    }
    val subT = encodeBody(bw, deltas, main = false)
    deltas.foreach(putLiteral(bw, _, subT))
    bw.put(0, 1) // no more transforms
    val t = encodeBody(bw, packed)
    packed.foreach(putLiteral(bw, _, t))
    assert(decodePx(riff(bw.bytes)).toSeq == want)
  }

  test("embedded fixture decodes to its pattern and locks the dhash") {
    val px = decodePx(Multimodal.WebpFixture.bytes)
    assert(px.toSeq == quadrants(16, 16))
    // the PNG twin decodes to the SAME pixels → identical dhash: the
    // cross-format invariant q250 builds on
    val png = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.WebpFixture.pngTwinBytes))
    val twinPx = png.getRGB(0, 0, 16, 16, null, 0, 16)
    assert(twinPx.toSeq == px.toSeq)
  }
}
