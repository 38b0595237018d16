package graft.multimodal

/** Pure-JVM VP8L (lossless WebP) still-image decoder — the lossless half
  * of the WebP format ("WebP Lossless Bitstream Specification", the
  * public Google/webmproject spec). A large share of scraped `.webp` is
  * VP8L (screenshots, diagrams, UI assets — content that compresses
  * losslessly), previously an honest degrade in [[Vp8.decodeWebP]];
  * round-13 VERDICT ask #8.
  *
  * Implemented in full:
  *  - LSB-first bitstream, 14-bit dimensions, version-0 gate;
  *  - canonical prefix codes (DEFLATE-style construction per the spec),
  *    both the 1–2-symbol "simple" form and the code-length-coded
  *    normal form with 16/17/18 repeat codes and the max_symbol cap;
  *  - meta prefix codes (entropy image selecting per-tile code groups);
  *  - the LZ77 backward-reference alphabet (24 length codes / 40
  *    distance codes with extra bits, the 120-entry 2D distance-code
  *    neighborhood map) and the 32-bit color cache (hash 0x1e35a7bd);
  *  - all four transforms, inverted in reverse reading order: predictor
  *    (14 spatial modes, tile-keyed), color (per-tile signed 3.5-bit
  *    channel cross-talk), subtract-green, and color indexing (delta-
  *    coded palette, incl. sub-byte pixel bundling at ≤16 colors).
  *
  * Honest degrades (None): bad signature/version, reserved transform
  * reuse, over-cap dimensions, truncation, prefix-code overflows, and
  * out-of-range backward references — never a throw, never wrong-shaped
  * output. Fixtures are independent transcriptions of the spec's worked
  * structures (Vp8lSpec); the distance-map and code-length-order tables
  * are transcribed from the spec like [[Vp8Tables]]' RFC constants.
  */
object Vp8l {

  /** Hostile-header cap, matching [[Vp8]]'s. */
  private val MaxDim = 4096

  // ---- LSB-first bit reader ------------------------------------------------

  private final class LsbReader(b: Array[Byte], start: Int, end: Int) {
    private var bytePos = start
    private var bitPos = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (bytePos >= end) throw new IllegalStateException("vp8l: eof")
        v |= ((b(bytePos) >> bitPos) & 1) << i
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
  }

  // ---- canonical prefix codes ----------------------------------------------

  /** Canonical prefix decoder (DEFLATE construction, as the spec
    * specifies): codes assigned in symbol order within ascending code
    * length; the stream delivers each code most-significant-bit first,
    * so the walk is code = (code << 1) | bit against per-length first
    * codes. A single-symbol code consumes zero bits (the spec's
    * "simple" one-symbol form and degenerate normal codes).
    */
  private final class Prefix(lengths: Array[Int]) {
    private val maxLen = lengths.max
    require(maxLen <= 15, "vp8l: code length > 15")
    private val used = lengths.count(_ > 0)
    private val only = if (used == 1) lengths.indexWhere(_ > 0) else -1
    // per-length canonical first code + symbols sorted by (length, symbol)
    private val count: Array[Int] = {
      val c = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) c(l) += 1)
      c
    }
    private val (first, offset) = {
      val f = new Array[Int](maxLen + 2)
      val o = new Array[Int](maxLen + 2)
      var code = 0
      var off = 0
      var l = 1
      while (l <= maxLen) {
        f(l) = code
        o(l) = off
        code = (code + count(l)) << 1
        off += count(l)
        l += 1
      }
      // completeness: over-subscribed codes are invalid streams
      require(used <= 1 || (f(maxLen) + count(maxLen)) <= (1 << maxLen),
        "vp8l: over-subscribed prefix code")
      (f, o)
    }
    private val sorted: Array[Int] = {
      val so = new Array[Int](used)
      val next = offset.clone()
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        if (l > 0) { so(next(l)) = s; next(l) += 1 }
        s += 1
      }
      so
    }
    def read(r: LsbReader): Int = {
      if (only >= 0) return only
      require(used > 0, "vp8l: empty prefix code")
      var code = 0
      var len = 0
      while (true) {
        code = (code << 1) | r.bit()
        len += 1
        if (len > maxLen) throw new IllegalStateException("vp8l: bad code")
        if (count(len) > 0 && code - first(len) < count(len))
          return sorted(offset(len) + (code - first(len)))
      }
      -1 // unreachable
    }
  }

  private def constantPrefix(sym: Int, alphabet: Int): Prefix = {
    val lens = new Array[Int](alphabet)
    lens(sym) = 1 // single used symbol → zero-bit reads via `only`
    new Prefix(lens)
  }

  /** Spec order in which the code-length code's lengths arrive. */
  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or normal form) for `alphabet` symbols. */
  private def readPrefixCode(r: LsbReader, alphabet: Int): Prefix = {
    if (r.bit() == 1) { // simple: 1 or 2 symbols, lengths 0 / 1
      val nSym = r.bit() + 1
      val first8 = r.bit()
      val s0 = if (first8 == 1) r.bits(8) else r.bits(1)
      require(s0 < alphabet, "vp8l: simple symbol out of range")
      if (nSym == 1) constantPrefix(s0, alphabet)
      else {
        val s1 = r.bits(8)
        require(s1 < alphabet && s1 != s0, "vp8l: bad simple pair")
        val lens = new Array[Int](alphabet)
        lens(s0) = 1; lens(s1) = 1
        new Prefix(lens)
      }
    } else { // normal: code lengths themselves prefix-coded
      val numCl = 4 + r.bits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(CodeLengthOrder(i)) = r.bits(3); i += 1 }
      val clCode = new Prefix(clLens)
      var maxSymbol =
        if (r.bit() == 1) {
          val lenNBits = 2 + 2 * r.bits(3)
          val ms = 2 + r.bits(lenNBits)
          require(ms <= alphabet, "vp8l: max_symbol > alphabet")
          ms
        } else alphabet
      val lens = new Array[Int](alphabet)
      var sym = 0
      var prevLen = 8
      var loop = true
      while (loop && sym < alphabet) {
        if (maxSymbol == 0) loop = false
        else {
          maxSymbol -= 1
          val cl = clCode.read(r)
          if (cl < 16) {
            lens(sym) = cl
            sym += 1
            if (cl != 0) prevLen = cl
          } else {
            val (extra, base, usePrev) = cl match {
              case 16 => (2, 3, true)
              case 17 => (3, 3, false)
              case _ => (7, 11, false)
            }
            var rep = base + r.bits(extra)
            require(sym + rep <= alphabet, "vp8l: repeat overflow")
            val fill = if (usePrev) prevLen else 0
            while (rep > 0) { lens(sym) = fill; sym += 1; rep -= 1 }
          }
        }
      }
      new Prefix(lens)
    }
  }

  // ---- LZ77 value coding -----------------------------------------------------

  /** Length/distance prefix value: codes 0–3 are 1–4; beyond that an
    * exponential bucket with extra bits (spec §"LZ77 backward reference").
    */
  private def lz77Value(code: Int, r: LsbReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + r.bits(extra) + 1
    }

  /** The spec's 120-entry 2D distance-code neighborhood, transcribed
    * from the WebP Lossless Bitstream Specification's distance-mapping
    * table (like [[Vp8Tables]]' RFC transcriptions): codes 1–120 name
    * (dx, dy) offsets of nearby pixels; codes above 120 are linear
    * distances minus 120.
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (6, 5), (-6, 5), (5, 6), (-5, 6),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def planeCodeToDistance(code: Int, width: Int): Int =
    if (code > 120) code - 120
    else {
      val (dx, dy) = DistMap(code - 1)
      val d = dx + dy * width
      if (d < 1) 1 else d
    }

  // ---- entropy-coded image ---------------------------------------------------

  private final case class Group(green: Prefix, red: Prefix, blue: Prefix,
                                 alpha: Prefix, dist: Prefix)

  private def readGroup(r: LsbReader, cacheSize: Int): Group =
    Group(
      readPrefixCode(r, 256 + 24 + cacheSize),
      readPrefixCode(r, 256), readPrefixCode(r, 256),
      readPrefixCode(r, 256), readPrefixCode(r, 40))

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  /** Decode one spatially/entropy-coded ARGB image. `topLevel` images may
    * carry a meta prefix-code (entropy) image; auxiliary images
    * (transform data, palettes, the entropy image itself) may not, but
    * DO carry their own color-cache header per the spec grammar.
    */
  private def decodeEntropyImage(r: LsbReader, w: Int, h: Int,
                                 topLevel: Boolean): Array[Int] = {
    require(w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024, "vp8l: size")
    val cacheBits = if (r.bit() == 1) r.bits(4) else 0
    require(cacheBits <= 11, "vp8l: cache bits")
    val cacheSize = if (cacheBits == 0) 0 else 1 << cacheBits
    val cache = if (cacheSize == 0) null else new Array[Int](cacheSize)

    var metaBits = 0
    var entropyImg: Array[Int] = null
    var entropyW = 0
    var nGroups = 1
    if (topLevel && r.bit() == 1) {
      metaBits = r.bits(3) + 2
      entropyW = subSize(w, metaBits)
      val eh = subSize(h, metaBits)
      entropyImg = decodeEntropyImage(r, entropyW, eh, topLevel = false)
      var m = 0
      var i = 0
      while (i < entropyImg.length) {
        val g = (entropyImg(i) >> 8) & 0xFFFF
        if (g > m) m = g
        i += 1
      }
      nGroups = m + 1
      require(nGroups <= 1024, "vp8l: meta group count")
    }
    val groups = Array.fill(nGroups)(readGroup(r, cacheSize))

    val out = new Array[Int](w * h)
    var pos = 0
    var x = 0
    var y = 0
    var group = groups(0)
    var tileX = -1 // forces group lookup at the first pixel of each tile row
    def lookupGroup(): Unit =
      if (entropyImg != null) {
        val g = (entropyImg((y >> metaBits) * entropyW + (x >> metaBits)) >> 8) & 0xFFFF
        group = groups(g)
      }
    @inline def insert(px: Int): Unit =
      if (cache != null)
        cache(((0x1e35a7bd * px) >>> (32 - cacheBits))) = px
    def advance(): Unit = {
      pos += 1; x += 1
      if (x == w) { x = 0; y += 1; tileX = -1 }
    }
    while (pos < w * h) {
      if (entropyImg != null && (x >> metaBits) != tileX) {
        tileX = x >> metaBits
        lookupGroup()
      }
      val s = group.green.read(r)
      if (s < 256) {
        val red = group.red.read(r)
        val blue = group.blue.read(r)
        val alpha = group.alpha.read(r)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        insert(px)
        advance()
      } else if (s < 256 + 24) {
        val len = lz77Value(s - 256, r)
        val distCode = lz77Value(group.dist.read(r), r)
        val dist = planeCodeToDistance(distCode, w)
        require(dist <= pos && len <= w * h - pos, "vp8l: bad backref")
        var k = 0
        while (k < len) {
          val px = out(pos - dist)
          out(pos) = px
          insert(px)
          advance()
          k += 1
        }
      } else {
        require(cache != null && s - 280 < cacheSize, "vp8l: cache index")
        out(pos) = cache(s - 280)
        advance()
      }
    }
    out
  }

  // ---- transforms --------------------------------------------------------------

  private sealed trait Transform
  private final case class PredictorT(bits: Int, tiles: Array[Int]) extends Transform
  private final case class ColorT(bits: Int, tiles: Array[Int]) extends Transform
  private case object SubGreenT extends Transform
  private final case class IndexT(widthBits: Int, packedW: Int,
                                  palette: Array[Int]) extends Transform

  @inline private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2, carry-safe
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  @inline private def addPixels(a: Int, b: Int): Int = {
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val ag = (((a >>> 8) & 0x00ff00ff) + ((b >>> 8) & 0x00ff00ff)) & 0x00ff00ff
    (ag << 8) | rb
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val c = clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
      out |= c << sh
      sh += 8
    }
    out
  }

  private def clampAddSubtractHalf(ave: Int, tl: Int): Int = {
    var out = 0
    var sh = 0
    while (sh < 32) {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      val c = clamp255(a + (a - b) / 2) // C-truncating division, per spec
      out |= c << sh
      sh += 8
    }
    out
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    // Σ_channels |L−TL| − |T−TL| ≤ 0 → the left edge continues → predict T
    var diff = 0
    var sh = 0
    while (sh < 32) {
      val tc = (t >>> sh) & 0xff
      val lc = (l >>> sh) & 0xff
      val tlc = (tl >>> sh) & 0xff
      diff += math.abs(lc - tlc) - math.abs(tc - tlc)
      sh += 8
    }
    if (diff <= 0) t else l
  }

  private def predict(mode: Int, l: Int, t: Int, tr: Int, tl: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(t, l, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(avg2(l, t), tl)
      case _ => throw new IllegalStateException("vp8l: predictor mode")
    }

  /** Inverse predictor transform, in place over the residual image.
    * Edge rules per the spec: (0,0) predicts black, the top row L, the
    * left column T; the top-right neighbor of a rightmost pixel is the
    * CURRENT row's first pixel (the flat-buffer wrap the format
    * defines — that pixel is already reconstructed in raster order).
    */
  private def inversePredictor(px: Array[Int], w: Int, h: Int,
                               t: PredictorT): Unit = {
    val tw = subSize(w, t.bits)
    var y = 0
    var pos = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(pos - 1) // mode 1: L
          else if (x == 0) px(pos - w) // mode 2: T
          else {
            val mode = (t.tiles((y >> t.bits) * tw + (x >> t.bits)) >> 8) & 0xff
            predict(mode, px(pos - 1), px(pos - w), px(pos - w + 1),
              px(pos - w - 1))
          }
        px(pos) = addPixels(px(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  @inline private def ctDelta(t: Int, c: Int): Int =
    (t.toByte * c.toByte) >> 5 // both operands signed int8, per the spec

  private def inverseColor(px: Array[Int], w: Int, h: Int, t: ColorT): Unit = {
    val tw = subSize(w, t.bits)
    var y = 0
    var pos = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = t.tiles((y >> t.bits) * tw + (x >> t.bits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val p = px(pos)
        val g = (p >> 8) & 0xff
        val newR = (((p >> 16) & 0xff) + ctDelta(g2r, g)) & 0xff
        val newB = ((p & 0xff) + ctDelta(g2b, g) + ctDelta(r2b, newR)) & 0xff
        px(pos) = (p & 0xff00ff00) | (newR << 16) | newB
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >>> 8) & 0xff
      val r = (((p >>> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Inverse color indexing: green channel holds palette indices — sub-
    * byte-bundled when the palette has ≤16 entries. Out-of-range indices
    * decode to transparent black (the conformant degrade).
    */
  private def inverseIndex(px: Array[Int], fullW: Int, h: Int,
                           t: IndexT): Array[Int] = {
    if (t.widthBits == 0) {
      var i = 0
      while (i < px.length) {
        val idx = (px(i) >>> 8) & 0xff
        px(i) = if (idx < t.palette.length) t.palette(idx) else 0
        i += 1
      }
      px
    } else {
      val bpp = 8 >> t.widthBits
      val mask = (1 << bpp) - 1
      val out = new Array[Int](fullW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < fullW) {
          val packed = px(y * t.packedW + (x >> t.widthBits))
          val shift = (x & ((1 << t.widthBits) - 1)) * bpp
          val idx = ((packed >>> 8) >>> shift) & mask
          out(y * fullW + x) = if (idx < t.palette.length) t.palette(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // ---- top-level decode ----------------------------------------------------------

  /** Decode a VP8L bitstream in `b[start, end)` to (width, height, ARGB
    * pixels row-major); None on any malformed/out-of-scope input.
    */
  def decode(b: Array[Byte], start: Int, end: Int): Option[(Int, Int, Array[Int])] = {
    try {
      if (b == null || end - start < 5) return None
      if ((b(start) & 0xFF) != 0x2F) return None // signature
      val r = new LsbReader(b, start + 1, end)
      val w = r.bits(14) + 1
      val h = r.bits(14) + 1
      if (w > MaxDim || h > MaxDim) return None
      r.bit() // alpha-is-used hint
      if (r.bits(3) != 0) return None // version must be 0

      var transforms = List.empty[Transform]
      var curW = w
      var seen = Set.empty[Int]
      while (r.bit() == 1) {
        val t = r.bits(2)
        require(!seen(t), "vp8l: transform repeated")
        seen += t
        t match {
          case 0 =>
            val bits = r.bits(3) + 2
            val tiles = decodeEntropyImage(r, subSize(curW, bits),
              subSize(h, bits), topLevel = false)
            transforms ::= PredictorT(bits, tiles)
          case 1 =>
            val bits = r.bits(3) + 2
            val tiles = decodeEntropyImage(r, subSize(curW, bits),
              subSize(h, bits), topLevel = false)
            transforms ::= ColorT(bits, tiles)
          case 2 =>
            transforms ::= SubGreenT
          case _ =>
            val n = r.bits(8) + 1
            val raw = decodeEntropyImage(r, n, 1, topLevel = false)
            // palette entries are delta-coded: per-channel prefix sums
            var i = 1
            while (i < n) { raw(i) = addPixels(raw(i), raw(i - 1)); i += 1 }
            val widthBits =
              if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            val packedW = subSize(curW, widthBits)
            transforms ::= IndexT(widthBits, packedW, raw)
            curW = packedW
        }
      }

      var px = decodeEntropyImage(r, curW, h, topLevel = true)
      // invert in reverse reading order (the list head is the last read)
      transforms.foreach {
        case p: PredictorT => inversePredictor(px, curW, h, p)
        case c: ColorT => inverseColor(px, curW, h, c)
        case SubGreenT => inverseSubGreen(px)
        case ix: IndexT =>
          px = inverseIndex(px, w, h, ix)
          curW = w
      }
      if (curW != w) return None // transform bookkeeping must restore width
      Some((w, h, px))
    } catch { case _: Exception => None }
  }
}
