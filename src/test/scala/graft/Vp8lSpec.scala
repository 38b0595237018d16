package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Vp8, Vp8l}

/** VP8L decoder laws over independently hand-encoded bitstreams (same
  * method as CavlcSpec/Vp8Spec: fixtures are transcriptions of the WebP
  * Lossless Bitstream Specification's coding rules, written by a
  * spec-following bit writer in this file, not by libwebp), covering the
  * simple and normal prefix-code forms, LZ77 backward references, the
  * color cache, and all four inverse transforms.
  */
class Vp8lSpec extends AnyFunSuite {

  /** LSB-first bit writer (the VP8L stream convention). */
  private final class BW {
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
    /** A canonical prefix CODE, delivered most-significant bit first. */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { put((c >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      val tail = if (n > 0) Array(cur.toByte) else Array.empty[Byte]
      buf.toArray ++ tail
    }
  }

  private def header(bw: BW, w: Int, h: Int): Unit = {
    bw.put(w - 1, 14); bw.put(h - 1, 14)
    bw.put(0, 1) // alpha hint
    bw.put(0, 3) // version
  }

  /** Simple prefix code, 1 symbol (zero-bit reads). */
  private def simple1(bw: BW, sym: Int): Unit = {
    bw.put(1, 1); bw.put(0, 1)
    if (sym < 2) { bw.put(0, 1); bw.put(sym, 1) }
    else { bw.put(1, 1); bw.put(sym, 8) }
  }

  /** Simple prefix code, 2 symbols (1-bit codes; canonical: the SMALLER
    * symbol reads as bit 0).
    */
  private def simple2(bw: BW, s0: Int, s1: Int): Unit = {
    bw.put(1, 1); bw.put(1, 1)
    if (s0 < 2) { bw.put(0, 1); bw.put(s0, 1) }
    else { bw.put(1, 1); bw.put(s0, 8) }
    bw.put(s1, 8)
  }

  /** One-group tree set where each channel has ≤2 distinct values and
    * pixels are all literals; returns the writer actions for the data.
    */
  private def writeLiteralImage(bw: BW, pixels: Seq[Int],
                                topLevel: Boolean): Unit = {
    bw.put(0, 1) // no color cache
    if (topLevel) bw.put(0, 1) // no meta prefix
    def channel(f: Int => Int): Seq[Int] = pixels.map(f).distinct.sorted
    val gs = channel(p => (p >> 8) & 0xFF)
    val rs = channel(p => (p >> 16) & 0xFF)
    val bs = channel(p => p & 0xFF)
    val as = channel(p => (p >>> 24) & 0xFF)
    def tree(vals: Seq[Int]): Unit =
      if (vals.length == 1) simple1(bw, vals.head)
      else { assert(vals.length == 2); simple2(bw, vals(0), vals(1)) }
    tree(gs); tree(rs); tree(bs); tree(as)
    simple1(bw, 0) // distance tree, unused
    pixels.foreach { p =>
      def emit(vals: Seq[Int], v: Int): Unit =
        if (vals.length == 2) bw.put(if (v == vals(1)) 1 else 0, 1)
      emit(gs, (p >> 8) & 0xFF)
      emit(rs, (p >> 16) & 0xFF)
      emit(bs, p & 0xFF)
      emit(as, (p >>> 24) & 0xFF)
    }
  }

  /** Canonical code assignment (the spec's DEFLATE construction):
    * symbol → (code, length), codes counted upward within ascending
    * length, symbols ascending within a length.
    */
  private def canonicalCodes(lens: Map[Int, Int]): Map[Int, (Int, Int)] = {
    val maxLen = lens.values.max
    var code = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    for (l <- 1 to maxLen) {
      for (s <- lens.filter(_._2 == l).keys.toSeq.sorted) {
        out(s) = (code, l)
        code += 1
      }
      code <<= 1
    }
    out.toMap
  }

  /** Complete (Kraft-exact) length assignment for k symbols: with
    * L = ⌈log₂ k⌉, the first 2^L − k symbols get L−1 bits, the rest L.
    */
  private def balancedLens(syms: Seq[Int]): Map[Int, Int] = {
    val k = syms.length
    if (k == 1) Map(syms.head -> 1)
    else {
      val L = 32 - Integer.numberOfLeadingZeros(k - 1)
      val short = (1 << L) - k
      syms.sorted.zipWithIndex.map { case (s, i) =>
        s -> (if (i < short) L - 1 else L)
      }.toMap
    }
  }

  /** Write a NORMAL-form prefix code for the given symbol→length map:
    * code-length code lengths in the spec's order array, no max_symbol
    * cap, one code-length symbol per alphabet entry (zeros written
    * individually — wasteful, unambiguous).
    */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  private def normalTree(bw: BW, lens: Map[Int, Int], alphabet: Int): Unit = {
    val clSyms = (lens.values.toSet + 0).toSeq.sorted
    val clLens = balancedLens(clSyms)
    val clCodes = canonicalCodes(clLens)
    val numCl = math.max(4, clSyms.map(ClOrder.indexOf(_)).max + 1)
    bw.put(0, 1) // not simple
    bw.put(numCl - 4, 4)
    for (i <- 0 until numCl) bw.put(clLens.getOrElse(ClOrder(i), 0), 3)
    bw.put(0, 1) // no max_symbol cap
    for (s <- 0 until alphabet) {
      val (c, l) = clCodes(lens.getOrElse(s, 0))
      if (clSyms.length > 1) bw.code(c, l) // single-symbol CL reads 0 bits
    }
  }

  private def decode(bw: BW): Option[(Int, Int, Array[Int])] = {
    val payload = Array(0x2F.toByte) ++ bw.bytes
    Vp8l.decode(payload, 0, payload.length)
  }

  test("literal pixels through simple prefix codes") {
    val bw = new BW
    header(bw, 2, 1)
    bw.put(0, 1) // no transforms
    val px = Seq(0xFF010A02, 0xFF011402) // green 10 then 20
    writeLiteralImage(bw, px, topLevel = true)
    val Some((w, h, out)) = decode(bw)
    assert((w, h) == (2, 1))
    assert(out.toSeq == px)
  }

  test("LZ77 backward reference copies with 2D distance code (1,0)") {
    val bw = new BW
    header(bw, 4, 1)
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no cache
    bw.put(0, 1) // no meta
    // green tree (NORMAL form — symbols ≥ 256 cannot use the simple
    // form's 8-bit symbols): {5, 258}; 258 = 256 + length-code 2 (len 3)
    val gLens = Map(5 -> 1, 258 -> 1)
    normalTree(bw, gLens, 280)
    val gCodes = canonicalCodes(gLens)
    simple1(bw, 7); simple1(bw, 9); simple1(bw, 0xFF) // r, b, a
    simple1(bw, 1) // distance tree: symbol 1 → value 2 → DistMap (1,0) → dist 1
    val (c5, l5) = gCodes(5)
    val (c258, l258) = gCodes(258)
    bw.code(c5, l5) // literal green 5
    bw.code(c258, l258) // copy 3 at dist 1
    val Some((_, _, out)) = decode(bw)
    assert(out.toSeq == Seq.fill(4)(0xFF070509))
  }

  test("color cache round trip: literal inserts, cache symbol reads back") {
    val p = 0xFF102030
    val cacheBits = 1
    val idx = (0x1e35a7bd * p) >>> (32 - cacheBits)
    val cacheSym = 280 + idx
    val bw = new BW
    header(bw, 2, 1)
    bw.put(0, 1) // no transforms
    bw.put(1, 1); bw.put(cacheBits, 4) // cache on
    bw.put(0, 1) // no meta
    val gLens = Map(((p >> 8) & 0xFF) -> 1, cacheSym -> 1)
    normalTree(bw, gLens, 280 + (1 << cacheBits)) // green alphabet grows with the cache
    val gCodes = canonicalCodes(gLens)
    simple1(bw, (p >> 16) & 0xFF); simple1(bw, p & 0xFF); simple1(bw, (p >>> 24) & 0xFF)
    simple1(bw, 0)
    val (cl, ll) = gCodes((p >> 8) & 0xFF)
    val (cc, lc) = gCodes(cacheSym)
    bw.code(cl, ll) // literal p (inserts into cache)
    bw.code(cc, lc) // cache symbol → p again
    val Some((_, _, out)) = decode(bw)
    assert(out.toSeq == Seq(p, p))
  }

  test("normal prefix-code form: code-length codes, max_symbol cap, canonical assignment") {
    val bw = new BW
    header(bw, 4, 1)
    bw.put(0, 1); bw.put(0, 1); bw.put(0, 1) // no transforms/cache/meta
    // green tree via the NORMAL form: lens(0)=1, lens(1)=2, lens(2)=2
    bw.put(0, 1) // not simple
    bw.put(1, 4) // num_code_lengths = 5 → order 17,18,0,1,2
    bw.put(0, 3); bw.put(0, 3); bw.put(0, 3) // cl(17)=0 cl(18)=0 cl(0)=0
    bw.put(1, 3); bw.put(2, 3) // cl(1)=1, cl(2)=2 → canonical: 1→"0", 2→"10"...
    // lengths {1:1, 2:2}: sym 1 reads as code 0 (1 bit), sym 2 as 10 (2 bits)
    bw.put(1, 1) // use max_symbol
    bw.put(0, 3) // length_nbits = 2
    bw.put(1, 2) // max_symbol = 3
    bw.code(0, 1) // cl sym 1 → green lens(0) = 1
    bw.code(2, 2) // cl sym 2 → green lens(1) = 2
    bw.code(2, 2) // cl sym 2 → green lens(2) = 2
    simple1(bw, 1); simple1(bw, 2); simple1(bw, 0xFF) // r, b, a
    simple1(bw, 0)
    // greens 0,1,2,0 → canonical codes 0, 10, 11, 0
    bw.code(0, 1); bw.code(2, 2); bw.code(3, 2); bw.code(0, 1)
    val Some((_, _, out)) = decode(bw)
    assert(out.toSeq.map(p => (p >> 8) & 0xFF) == Seq(0, 1, 2, 0))
  }

  test("subtract-green inverse adds green to red and blue") {
    val bw = new BW
    header(bw, 1, 1)
    bw.put(1, 1); bw.put(2, 2) // transform: subtract-green
    bw.put(0, 1) // no more transforms
    writeLiteralImage(bw, Seq(0xFF0A141E), topLevel = true) // r10 g20 b30
    val Some((_, _, out)) = decode(bw)
    assert(out(0) == 0xFF1E1432) // r=30, g=20, b=50
  }

  test("predictor transform: edge rules and the tile-keyed mode") {
    val bw = new BW
    header(bw, 2, 2)
    bw.put(1, 1); bw.put(0, 2) // transform: predictor
    bw.put(0, 3) // size_bits = 2 → one 4x4 tile covers the image
    // tile image (1x1, not top-level): green = mode 7 (avg2(L, T))
    writeLiteralImage(bw, Seq(0xFF000700), topLevel = false)
    bw.put(0, 1) // no more transforms
    // residuals (all-channel mod-256 adds): (0,0)=+black (which already
    // contributes alpha FF), (1,0)=+L, (0,1)=+T, (1,1)=+avg2(L,T) —
    // four distinct greens, so the green tree takes the normal form
    val res = Seq(0x00006400, 0x00001400, 0x00000A00, 0x00000200)
    bw.put(0, 1); bw.put(0, 1) // no cache, no meta
    val gLens = balancedLens(res.map(p => (p >> 8) & 0xFF))
    normalTree(bw, gLens, 280)
    val gCodes = canonicalCodes(gLens)
    simple1(bw, 0); simple1(bw, 0) // r, b constant 0
    simple1(bw, 0) // alpha residual constant 0 (predictions carry FF)
    simple1(bw, 0) // distance, unused
    res.foreach { p =>
      val (c, l) = gCodes((p >> 8) & 0xFF)
      bw.code(c, l)
    }
    val Some((_, _, out)) = decode(bw)
    assert(out(0) == 0xFF006400) // black + res
    assert(out(1) == 0xFF007800) // L + res: green 0x64 + 0x14
    assert(((out(2) >> 8) & 0xFF) == 0x6E) // T + res: 0x64 + 0x0A
    // (1,1): avg2(L=out(2), T=out(1)) green = (0x6E + 0x78)/2 = 0x73; +2
    assert(((out(3) >> 8) & 0xFF) == 0x75)
    assert((out(3) >>> 24) == 0xFF) // alpha: avg2(ff,ff)+0
  }

  test("color transform inverse applies signed per-tile deltas") {
    val bw = new BW
    header(bw, 1, 1)
    bw.put(1, 1); bw.put(1, 2) // transform: color
    bw.put(0, 3) // size_bits = 2
    // tile cte pixel: g2r = blue channel = 16, g2b = green = 0, r2b = red = 0
    writeLiteralImage(bw, Seq(0xFF000010), topLevel = false)
    bw.put(0, 1)
    writeLiteralImage(bw, Seq(0xFF0A4000), topLevel = true) // r10 g64 b0
    val Some((_, _, out)) = decode(bw)
    // delta(g2r=16, g=64) = (16 * 64) >> 5 = 32 → r = 10 + 32 = 42
    assert(((out(0) >> 16) & 0xFF) == 42)
    assert(((out(0) >> 8) & 0xFF) == 64)
  }

  test("color indexing with sub-byte bundling and delta-coded palette") {
    val bw = new BW
    header(bw, 4, 1)
    bw.put(1, 1); bw.put(3, 2) // transform: color indexing
    bw.put(2 - 1, 8) // palette size 2 → widthBits 3, 8 px/byte, packedW 1
    val c0 = 0xFF800010
    val c1 = 0xFF004080
    def sub(a: Int, b: Int): Int = { // per-channel delta the encoder stores
      var out = 0; var sh = 0
      while (sh < 32) { out |= ((((a >>> sh) & 0xFF) - ((b >>> sh) & 0xFF)) & 0xFF) << sh; sh += 8 }
      out
    }
    writeLiteralImage(bw, Seq(c0, sub(c1, c0)), topLevel = false)
    bw.put(0, 1) // no more transforms
    // packed 1x1: green byte bits 0..3 = indices 1,0,1,1 → 0b1101 = 13
    writeLiteralImage(bw, Seq(13 << 8), topLevel = true)
    val Some((w, _, out)) = decode(bw)
    assert(w == 4)
    assert(out.toSeq == Seq(c1, c0, c1, c1))
  }

  test("degrades: bad signature, truncation, nonzero version, over-cap dims") {
    assert(Vp8l.decode(Array[Byte](0x2E, 0, 0, 0, 0), 0, 5).isEmpty)
    assert(Vp8l.decode(null, 0, 0).isEmpty)
    val bw = new BW
    header(bw, 2, 1)
    bw.put(0, 1)
    val full = Array(0x2F.toByte) ++ bw.bytes
    assert(Vp8l.decode(full, 0, math.min(3, full.length)).isEmpty)
    val bad = new BW
    bad.put(2 - 1, 14); bad.put(0, 14); bad.put(0, 1); bad.put(5, 3) // version 5
    val bp = Array(0x2F.toByte) ++ bad.bytes
    assert(Vp8l.decode(bp, 0, bp.length).isEmpty)
  }

  test("decodeWebP routes VP8L chunks to a Rec.601 luma plane") {
    val bw = new BW
    header(bw, 2, 1)
    bw.put(0, 1)
    writeLiteralImage(bw, Seq(0xFFFFFFFF, 0xFF000000), topLevel = true)
    val vp8l = Array(0x2F.toByte) ++ bw.bytes
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val chunk = "VP8L".getBytes ++ le32(vp8l.length) ++ vp8l ++
      (if (vp8l.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val riff = "RIFF".getBytes ++ le32(4 + chunk.length) ++ "WEBP".getBytes ++ chunk
    val Some((w, h, luma)) = Vp8.decodeWebP(riff)
    assert((w, h) == (2, 1))
    assert((luma(0) & 0xFF) == 255 && (luma(1) & 0xFF) == 0)
  }
}
