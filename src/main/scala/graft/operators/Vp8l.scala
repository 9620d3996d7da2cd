package graft.operators

/** WebP-lossless (VP8L) decoder — the next-largest real crawl image
  * format after JPEG/PNG (VERDICT r12 "Next round" #4), decoded to
  * pixels behind the same magic-gated, NonFatal-guarded boundary as
  * [[Multimodal.PngCodec]]. The JDK's ImageIO has no WebP reader, so
  * this is a from-scratch implementation of the PUBLIC WebP Lossless
  * Bitstream Specification (RFC 9649): RIFF container walk, LSB-first
  * bit reader, simple + normal (canonical, DEFLATE-style) prefix
  * codes read via the code-length code, meta-prefix entropy
  * partitioning, color cache, LZ77 backward references (both direct
  * distances and the 120-entry 2D neighborhood map), and all four
  * inverse transforms (predictor ×14 modes, color, subtract-green,
  * color-indexing incl. sub-byte pixel bundling).
  *
  * The neighborhood table is GENERATED from the spec's ordering rule
  * — offsets (dx, dy), dy ∈ [0,8], dx ∈ [−8,8], future-only rows
  * excluded, sorted by (dx²+dy² asc, dy desc, dx desc) — which
  * reproduces the spec's printed table; generating it makes the rule
  * checkable instead of 120 magic constants.
  *
  * Lossy WebP (`VP8 ` chunk) is a full DCT codec and stays OUT of
  * scope honestly: it falls through to the deterministic stub like
  * any other undecodable payload. Any malformed stream throws
  * internally and surfaces as None — decode failures must never
  * abort a 100 TB scan. */
object Vp8lCodec {

  /** 'R','I','F','F', …, 'W','E','B','P' */
  def isWebp(content: Array[Byte]): Boolean =
    content.length >= 16 &&
      content(0) == 'R' && content(1) == 'I' &&
      content(2) == 'F' && content(3) == 'F' &&
      content(8) == 'W' && content(9) == 'E' &&
      content(10) == 'B' && content(11) == 'P'

  /** WebP container whose image chunk is lossless (VP8L + 0x2f). */
  def isWebpLossless(content: Array[Byte]): Boolean =
    isWebp(content) && vp8lPayload(content).isDefined

  /** Walk the RIFF chunks for the VP8L payload (usually the first
    * chunk; VP8X-extended files carry it after metadata chunks). */
  private def vp8lPayload(c: Array[Byte]): Option[(Int, Int)] = {
    var off = 12
    while (off + 8 <= c.length) {
      val tag = new String(c, off, 4, "ISO-8859-1")
      val size = (c(off + 4) & 0xff) | ((c(off + 5) & 0xff) << 8) |
        ((c(off + 6) & 0xff) << 16) | ((c(off + 7) & 0xff) << 24)
      if (size < 0 || off + 8 + size > c.length) return None
      if (tag == "VP8L")
        return if (size >= 1 && (c(off + 8) & 0xff) == 0x2f)
          Some((off + 9, size - 1)) else None
      off += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    None
  }

  def decode(content: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try vp8lPayload(content).map { case (off, len) =>
      val br = new BitReader(content, off, len)
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      br.bits(1) // alpha hint
      require(br.bits(3) == 0, "vp8l version")
      val px = decodeImageStream(br, w, h, isMain = true)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      img
    } catch { case scala.util.control.NonFatal(_) => None }

  // ── bit reader: LSB-first within bytes, little-endian across ──
  private final class BitReader(
      data: Array[Byte], byteOff: Int, byteLen: Int) {
    private var pos = 0L // bit position
    private val limit = byteLen.toLong * 8
    def bit(): Int = {
      require(pos < limit, "vp8l: out of bits")
      val b = (data(byteOff + (pos >> 3).toInt) >> (pos & 7).toInt) & 1
      pos += 1
      b
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
  }

  // ── canonical prefix codes (DEFLATE-style code assignment) ──
  private final class PrefixCode(
      table: java.util.HashMap[Integer, Integer], single: Int) {
    def read(br: BitReader): Int =
      if (single >= 0) single
      else {
        var code = 1 // sentinel high bit keeps lengths disjoint
        var len = 0
        while (len < 16) {
          code = (code << 1) | br.bit()
          len += 1
          val s = table.get(code)
          if (s != null) return s.intValue()
        }
        throw new IllegalStateException("vp8l: bad prefix code")
      }
  }

  private def buildPrefix(lengths: Array[Int]): PrefixCode = {
    var nz = 0
    var lone = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { nz += 1; lone = i }
      i += 1
    }
    require(nz > 0, "vp8l: empty prefix code")
    if (nz == 1)
      return new PrefixCode(new java.util.HashMap, lone)
    val maxLen = 15
    val blCount = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) blCount(l) += 1)
    var code = 0
    val nextCode = new Array[Int](maxLen + 1)
    var l = 1
    while (l <= maxLen) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    val table = new java.util.HashMap[Integer, Integer]
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        table.put((1 << len) | nextCode(len), i)
        nextCode(len) += 1
      }
      i += 1
    }
    new PrefixCode(table, -1)
  }

  /** kCodeLengthCodeOrder from the spec. */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def readPrefixCode(br: BitReader, alphabet: Int): PrefixCode =
    if (br.bit() == 1) { // simple form: 1 or 2 symbols
      val numSyms = br.bit() + 1
      val lengths = new Array[Int](alphabet)
      val sym0 = if (br.bit() == 1) br.bits(8) else br.bit()
      require(sym0 < alphabet, "vp8l: simple symbol out of range")
      if (numSyms == 1) lengths(sym0) = 1 // buildPrefix → 0-bit single
      else {
        val sym1 = br.bits(8)
        require(sym1 < alphabet && sym1 != sym0, "vp8l: simple symbols")
        lengths(sym0) = 1
        lengths(sym1) = 1
      }
      buildPrefix(lengths)
    } else {
      val numCl = 4 + br.bits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clCode = buildPrefix(clLengths)
      var maxSymbol =
        if (br.bit() == 1) {
          val lenNBits = 2 + 2 * br.bits(3)
          2 + br.bits(lenNBits)
        } else alphabet
      val lengths = new Array[Int](alphabet)
      var sym = 0
      var prev = 8
      var done = false
      while (sym < alphabet && !done) {
        if (maxSymbol == 0) done = true
        else {
          maxSymbol -= 1
          val cl = clCode.read(br)
          if (cl < 16) {
            lengths(sym) = cl
            sym += 1
            if (cl != 0) prev = cl
          } else {
            val (rep, repVal) = cl match {
              case 16 => (3 + br.bits(2), prev)
              case 17 => (3 + br.bits(3), 0)
              case 18 => (11 + br.bits(7), 0)
              case _ => throw new IllegalStateException("vp8l: cl")
            }
            require(sym + rep <= alphabet, "vp8l: length repeat overflow")
            var r = 0
            while (r < rep) { lengths(sym) = repVal; sym += 1; r += 1 }
          }
        }
      }
      buildPrefix(lengths)
    }

  // ── LZ77 ──
  /** Prefix-coded LZ77 value: codes 0–3 literal 1–4, then
    * (2 + (c&1)) << extra + ReadBits(extra) + 1. */
  private def lz77Value(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  /** The 120-entry neighborhood map, generated from the spec's
    * ordering (see object Scaladoc). Index = distance code − 1. */
  private val DistMap: Array[(Int, Int)] = {
    val cands = for {
      dy <- 0 to 8
      dx <- -8 to 8
      if dy > 0 || dx > 0
    } yield (dx, dy)
    cands.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, -dy, -dx)
    }.take(120).toArray
  }

  private def planeDistance(code: Int, w: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistMap(code - 1)
      math.max(1, dy * w + dx)
    }

  // ── per-group prefix codes ──
  private final class Group(
      val green: PrefixCode, val red: PrefixCode, val blue: PrefixCode,
      val alpha: PrefixCode, val dist: PrefixCode)

  private def readGroup(br: BitReader, cacheSize: Int): Group =
    new Group(
      readPrefixCode(br, 256 + 24 + cacheSize),
      readPrefixCode(br, 256), readPrefixCode(br, 256),
      readPrefixCode(br, 256), readPrefixCode(br, 40))

  private def divRoundUp(a: Int, b: Int): Int = (a + b - 1) / b

  /** Entropy-coded image (transform data, palette, entropy image):
    * color-cache info + one prefix group + pixel data — no
    * transforms, no meta partitioning. */
  private def decodeSubImage(br: BitReader, w: Int, h: Int): Array[Int] = {
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    require(cacheBits <= 11, "vp8l: cache bits")
    val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
    val group = readGroup(br, cacheSize)
    decodePixels(br, w, h, Array(group), null, 0, 0, cacheBits)
  }

  /** The main image stream: transforms, color cache, meta prefix
    * groups, pixel data, then inverse transforms in reverse order. */
  private def decodeImageStream(
      br: BitReader, w0: Int, h0: Int, isMain: Boolean): Array[Int] = {
    var w = w0
    // (type, data, auxiliary, width the transform was read at)
    var transforms = List.empty[(Int, Array[Int], Int, Int)]
    var seen = Set.empty[Int]
    while (br.bit() == 1) {
      val t = br.bits(2)
      require(!seen.contains(t), "vp8l: duplicate transform")
      seen += t
      t match {
        case 0 | 1 => // predictor / color: block-sub-image transforms
          val bits = br.bits(3) + 2
          val sw = divRoundUp(w, 1 << bits)
          val sh = divRoundUp(h0, 1 << bits)
          transforms ::= ((t, decodeSubImage(br, sw, sh), bits, w))
        case 2 => // subtract green: no data
          transforms ::= ((2, null, 0, w))
        case 3 => // color indexing
          val paletteSize = br.bits(8) + 1
          val widthBits =
            if (paletteSize <= 2) 3
            else if (paletteSize <= 4) 2
            else if (paletteSize <= 16) 1
            else 0
          val raw = decodeSubImage(br, paletteSize, 1)
          // palette entries are delta-coded per channel
          var i = 1
          while (i < raw.length) {
            raw(i) = addPixels(raw(i), raw(i - 1))
            i += 1
          }
          transforms ::= ((3, raw, widthBits, w))
          w = divRoundUp(w, 1 << widthBits)
      }
    }
    // spatially-coded image: cache info + meta prefix + data
    val cacheBits = if (br.bit() == 1) br.bits(4) else 0
    require(cacheBits <= 11, "vp8l: cache bits")
    val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
    var metaBits = 0
    var meta: Array[Int] = null
    var nGroups = 1
    if (br.bit() == 1) { // use meta prefix codes
      metaBits = br.bits(3) + 2
      val mw = divRoundUp(w, 1 << metaBits)
      val mh = divRoundUp(h0, 1 << metaBits)
      val mpx = decodeSubImage(br, mw, mh)
      meta = mpx.map(p => ((p >> 8) & 0xffff))
      nGroups = meta.max + 1
    }
    val groups = Array.fill(nGroups)(readGroup(br, cacheSize))
    var px = decodePixels(br, w, h0, groups, meta, metaBits,
      if (meta != null) divRoundUp(w, 1 << metaBits) else 0, cacheBits)
    // inverse transforms, most recently read first
    transforms.foreach { case (t, data, aux, wAt) =>
      t match {
        case 0 => inversePredictor(px, wAt, h0, aux, data)
        case 1 => inverseColor(px, wAt, h0, aux, data)
        case 2 => inverseSubtractGreen(px)
        case 3 => px = inverseIndexing(px, wAt, h0, aux, data)
      }
      w = wAt
    }
    require(px.length == w0 * h0, "vp8l: size mismatch after transforms")
    px
  }

  private def decodePixels(
      br: BitReader, w: Int, h: Int, groups: Array[Group],
      meta: Array[Int], metaBits: Int, metaW: Int,
      cacheBits: Int): Array[Int] = {
    val n = w * h
    require(n > 0 && n <= (1 << 26), "vp8l: image too large")
    val px = new Array[Int](n)
    val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def insert(p: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * p) >>> (32 - cacheBits)) = p
    var pos = 0
    while (pos < n) {
      val g =
        if (meta == null) groups(0)
        else {
          val x = pos % w
          val y = pos / w
          groups(meta((y >> metaBits) * metaW + (x >> metaBits)))
        }
      val s = g.green.read(br)
      if (s < 256) { // literal ARGB
        val red = g.red.read(br)
        val blue = g.blue.read(br)
        val alpha = g.alpha.read(br)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = p
        insert(p)
        pos += 1
      } else if (s < 256 + 24) { // LZ77 backward reference
        val length = lz77Value(s - 256, br)
        val distCode = lz77Value(g.dist.read(br), br)
        val dist = planeDistance(distCode, w)
        require(dist <= pos && pos + length <= n, "vp8l: bad backref")
        var i = 0
        while (i < length) {
          val p = px(pos - dist)
          px(pos) = p
          insert(p)
          pos += 1
          i += 1
        }
      } else { // color-cache hit
        require(cache != null, "vp8l: cache symbol without cache")
        val idx = s - 256 - 24
        require(idx < cacheSize, "vp8l: cache index")
        px(pos) = cache(idx)
        pos += 1
      }
    }
    px
  }

  // ── inverse transforms ──
  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = ((a & 0xff) + (b & 0xff)) & 0xff
    aa | rr | gg | bb
  }

  private def average2(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) / 2) << 24) |
      (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2) << 16) |
      (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2) << 8) |
      (((a & 0xff) + (b & 0xff)) / 2)

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int) = clamp255(
      ((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(a: Int, b: Int): Int = {
    def ch(sh: Int) = {
      val av = (a >>> sh) & 0xff
      val bv = (b >>> sh) & 0xff
      clamp255(av + (av - bv) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  /** Select: Manhattan distance from p = L + T − TL; pL = Σ|T−TL|,
    * pT = Σ|L−TL|; the closer of L/T (L on pL < pT). */
  private def select(l: Int, t: Int, tl: Int): Int = {
    def d(a: Int, b: Int): Int = {
      var s = 0
      var sh = 0
      while (sh < 32) {
        s += math.abs(((a >>> sh) & 0xff) - ((b >>> sh) & 0xff))
        sh += 8
      }
      s
    }
    if (d(t, tl) < d(l, tl)) l else t
  }

  private def inversePredictor(
      px: Array[Int], w: Int, h: Int, bits: Int, sub: Array[Int]): Unit = {
    val subW = divRoundUp(w, 1 << bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1) // first row: left
          else if (x == 0) px(pos - w) // first column: top
          else {
            val mode = (sub((y >> bits) * subW + (x >> bits)) >> 8) & 0xff
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            // TR of the rightmost pixel is pos − w + 1 = the current
            // row's first (already-decoded) pixel — the linear-layout
            // wraparound the spec prescribes, same expression as the
            // interior case.
            val tr = px(pos - w + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => average2(average2(l, tr), t)
              case 6 => average2(l, tl)
              case 7 => average2(l, t)
              case 8 => average2(tl, t)
              case 9 => average2(t, tr)
              case 10 => average2(average2(l, tl), average2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(average2(l, t), tl)
              case _ => throw new IllegalStateException("vp8l: predictor")
            }
          }
        px(pos) = addPixels(px(pos), pred)
        x += 1
      }
      y += 1
    }
  }

  /** (int8 t × int8 c) >> 5 — both operands sign-extended. */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  private def inverseColor(
      px: Array[Int], w: Int, h: Int, bits: Int, sub: Array[Int]): Unit = {
    val subW = divRoundUp(w, 1 << bits)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pos = y * w + x
        val cte = sub((y >> bits) * subW + (x >> bits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val p = px(pos)
        val green = (p >> 8) & 0xff
        val red = (((p >> 16) & 0xff) + ctDelta(g2r, green)) & 0xff
        var blue = ((p & 0xff) + ctDelta(g2b, green)) & 0xff
        blue = (blue + ctDelta(r2b, red)) & 0xff
        px(pos) = (p & 0xff00ff00) | (red << 16) | blue
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Expand palette indices (carried in the green channel, possibly
    * bundled sub-byte) back to ARGB; out-of-range index → transparent
    * black, per spec. */
  private def inverseIndexing(
      px: Array[Int], w: Int, h: Int, widthBits: Int,
      palette: Array[Int]): Array[Int] = {
    if (widthBits == 0) {
      px.map { p =>
        val idx = (p >> 8) & 0xff
        if (idx < palette.length) palette(idx) else 0
      }
    } else {
      val packedW = divRoundUp(w, 1 << widthBits)
      val bitsPer = 8 >> widthBits
      val mask = (1 << bitsPer) - 1
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val packed = px(y * packedW + (x >> widthBits))
          val green = (packed >> 8) & 0xff
          val shift = (x & ((1 << widthBits) - 1)) * bitsPer
          val idx = (green >> shift) & mask
          out(y * w + x) = if (idx < palette.length) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }
}
