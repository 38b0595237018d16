package graft.multimodal

import Vp8Tables._

/** Pure-JVM VP8 (RFC 6386) keyframe PIXEL decode for WebM payloads — the
  * real-decode upgrade of the container-metadata-only Matroska path,
  * completing the second major container family after the MP4/H.264 path
  * ([[H264]]). The reference pipeline has NO video handling; like the
  * H.264 decoder this is a framework-native capability of the multimodal
  * column family (opaque binary payloads + typed decode), not a
  * reference-behavior port.
  *
  * Honest scope, stated in the schema rather than faked. Implemented in
  * full: the boolean (arithmetic) decoder (§7), keyframe header parse —
  * segmentation with per-segment quantizers, filter parameters, up to 8
  * token partitions, quantizer indices with all five deltas, the 1056
  * conditional coefficient-probability updates (§13.4) — per-macroblock
  * keyframe mode parsing (§11.2), token/coefficient decoding with the
  * band/context state machine and EOB-after-zero suppression (§13.3),
  * dequantization (§14.1), the inverse Walsh–Hadamard transform for the
  * Y2 block (§14.3), the fixed-point inverse DCT (§14.4), and DC / V / H
  * / TM 16x16 luma and 8x8 chroma intra prediction with the spec's
  * 127/129 frame-border conventions (§12.2).
  *
  * Still NOT reconstructed — a frame using them returns None and the
  * row degrades to `decoded=false` rather than emitting non-conformant
  * pixels:
  *
  *  - inter (non-key) frames — no reference-frame motion compensation;
  *  - B_PRED macroblocks — the per-subblock modes are coded against the
  *    900-entry keyframe mode-context probability table, which (unlike
  *    the algorithmic §12.3 predictors) cannot be transcribed here with
  *    enough confidence to stand behind the resulting pixels, and a
  *    wrong probability decodes to a syntactically valid wrong mode
  *    rather than a detectable error; deliberately deferred until the
  *    table can be validated against conformance vectors;
  *  - laced WebM blocks (VP8 keyframes are not laced in practice).
  *
  * The §15 loop filter IS reconstructed (both the normal and the simple
  * filter, with sharpness-adjusted limits, keyframe high-edge-variance
  * thresholds, per-segment levels and the intra ref-frame delta), so
  * deblocked frames emit their true conformant pixels rather than
  * degrading.
  *
  * Table provenance and its limits are documented in [[Vp8Tables]].
  * Corrupt or truncated streams degrade to None via syntax checks and a
  * bounded-overread guard in the boolean decoder, never garbage pixels.
  */
object Vp8 {

  // ---- boolean (arithmetic) decoder, RFC 6386 §7 -----------------------

  /** Bool decoder over `b[start, end)`. Reads at most [[MaxOverread]]
    * virtual zero bytes past `end` (the decoder's 2-byte lookahead makes
    * a small overread legal for a well-formed stream); beyond that the
    * stream is lying about its length and the decode throws (caught into
    * the None degrade by [[decodeKeyframe]]).
    */
  private[graft] final class BoolDecoder(b: Array[Byte], start: Int, end: Int) {
    private val MaxOverread = 4
    private var overread = 0
    private def byteAt(i: Int): Int =
      if (i < end) b(i) & 0xFF
      else {
        overread += 1
        if (overread > MaxOverread)
          throw new IllegalStateException("vp8 bool decoder overread")
        0
      }
    private var range = 255
    private var value = (byteAt(start) << 8) | byteAt(start + 1)
    private var pos = start + 2
    private var bitCount = 0

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= byteAt(pos); pos += 1 }
      }
      ret
    }

    /** n uncompressed bits, MSB first (the header's L(n) fields). */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** L(n) magnitude followed by a sign bit (quantizer / filter deltas). */
    def signedLiteral(n: Int): Int = {
      val m = literal(n)
      if (bool(128) == 1) -m else m
    }

    /** Tree read (§8.2): `t` holds (left, right) successor pairs, leaves
      * negated; prob for node pair at index i is p(i >> 1). `startNode`
      * = 2 skips the token tree's EOB branch after a ZERO token.
      */
    def tree(t: Array[Int], p: Array[Int], startNode: Int = 0): Int = {
      var i = startNode
      do { i = t(i + bool(p(i >> 1))) } while (i > 0)
      -i
    }
  }

  // ---- inverse transforms (RFC 6386 §14.3, §14.4) ------------------------

  private val CosPi8Sqrt2Minus1 = 20091
  private val SinPi8Sqrt2 = 35468

  /** Inverse WHT of the Y2 block: 16 dequantized inputs (raster order)
    * → the 16 luma subblock DC values (raster order of subblocks).
    */
  private[graft] def inverseWht(in: Array[Int], out: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = in(i) + in(12 + i)
      val b1 = in(4 + i) + in(8 + i)
      val c1 = in(4 + i) - in(8 + i)
      val d1 = in(i) - in(12 + i)
      t(i) = a1 + b1
      t(4 + i) = c1 + d1
      t(8 + i) = a1 - b1
      t(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // rows, with the final (x + 3) >> 3
      val r = 4 * i
      val a1 = t(r) + t(r + 3)
      val b1 = t(r + 1) + t(r + 2)
      val c1 = t(r + 1) - t(r + 2)
      val d1 = t(r) - t(r + 3)
      out(r) = (a1 + b1 + 3) >> 3
      out(r + 1) = (c1 + d1 + 3) >> 3
      out(r + 2) = (a1 - b1 + 3) >> 3
      out(r + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  /** Fixed-point 4x4 inverse DCT (§14.4) of the dequantized block `q`
    * (raster order), residual ADDED into `plane` at (x0, y0) with
    * clamping. The DC-only shortcut real decoders use is algebraically
    * identical to the full transform, so no special case is needed.
    */
  private[graft] def idctAdd(plane: Array[Byte], stride: Int,
                             x0: Int, y0: Int, q: Array[Int]): Unit = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) { // vertical pass over columns
      val a1 = q(i) + q(8 + i)
      val b1 = q(i) - q(8 + i)
      val c1 = ((q(4 + i) * SinPi8Sqrt2) >> 16) -
        (q(12 + i) + ((q(12 + i) * CosPi8Sqrt2Minus1) >> 16))
      val d1 = (q(4 + i) + ((q(4 + i) * CosPi8Sqrt2Minus1) >> 16)) +
        ((q(12 + i) * SinPi8Sqrt2) >> 16)
      t(i) = a1 + d1
      t(12 + i) = a1 - d1
      t(4 + i) = b1 + c1
      t(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) { // horizontal pass over rows, then add + clamp
      val r = 4 * i
      val a1 = t(r) + t(r + 2)
      val b1 = t(r) - t(r + 2)
      val c1 = ((t(r + 1) * SinPi8Sqrt2) >> 16) -
        (t(r + 3) + ((t(r + 3) * CosPi8Sqrt2Minus1) >> 16))
      val d1 = (t(r + 1) + ((t(r + 1) * CosPi8Sqrt2Minus1) >> 16)) +
        ((t(r + 3) * SinPi8Sqrt2) >> 16)
      val base = (y0 + i) * stride + x0
      addClamp(plane, base, (a1 + d1 + 4) >> 3)
      addClamp(plane, base + 1, (b1 + c1 + 4) >> 3)
      addClamp(plane, base + 2, (b1 - c1 + 4) >> 3)
      addClamp(plane, base + 3, (a1 - d1 + 4) >> 3)
      i += 1
    }
  }

  private def addClamp(plane: Array[Byte], at: Int, r: Int): Unit = {
    val v = (plane(at) & 0xFF) + r
    plane(at) = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
  }

  // ---- loop filter (RFC 6386 §15) -----------------------------------------
  // The deblocking arithmetic lives in the SIGNED domain (pixel − 128)
  // with saturating signed-8-bit clamps at every step; shifts on the
  // clamped values are arithmetic, exactly as specified.

  private def scClamp(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v

  /** Sharpness-adjusted interior (difference) limit for a level (§15.2). */
  private[graft] def interiorLimit(level: Int, sharpness: Int): Int = {
    var il = level
    if (sharpness > 0) {
      il >>= (if (sharpness > 4) 2 else 1)
      if (il > 9 - sharpness) il = 9 - sharpness
    }
    if (il < 1) 1 else il
  }

  /** Keyframe high-edge-variance threshold for a level (§15.2). */
  private[graft] def hevThreshKey(level: Int): Int =
    if (level >= 40) 2 else if (level >= 15) 1 else 0

  /** One filterable edge position: `get(k)`/`set(k)` address qₖ for
    * k ≥ 0 and p₍₋₁₋ₖ₎ for k < 0; `step` is 1 for vertical edges and the
    * row stride for horizontal ones.
    */
  private final class Edge(plane: Array[Byte], base: Int, step: Int) {
    def get(k: Int): Int = plane(base + k * step) & 0xFF
    def set(k: Int, v: Int): Unit = plane(base + k * step) = v.toByte
  }

  /** Normal-filter mask over 8 samples (§15.2): six interior-difference
    * checks plus the cross-edge budget 2·|p0−q0| + |p1−q1|/2.
    */
  private def filterMask(lim: Int, blim: Int, e: Edge): Boolean =
    math.abs(e.get(-4) - e.get(-3)) <= lim &&
      math.abs(e.get(-3) - e.get(-2)) <= lim &&
      math.abs(e.get(-2) - e.get(-1)) <= lim &&
      math.abs(e.get(1) - e.get(0)) <= lim &&
      math.abs(e.get(2) - e.get(1)) <= lim &&
      math.abs(e.get(3) - e.get(2)) <= lim &&
      math.abs(e.get(-1) - e.get(0)) * 2 + math.abs(e.get(-2) - e.get(1)) / 2 <= blim

  private def isHev(thr: Int, e: Edge): Boolean =
    math.abs(e.get(-2) - e.get(-1)) > thr || math.abs(e.get(1) - e.get(0)) > thr

  /** Subblock-edge filter (§15.3): adjusts p1 p0 q0 p1; the outer pair
    * only without high edge variance, where the p1−q1 term also drops.
    */
  private def normalFilter(lim: Int, blim: Int, thr: Int, e: Edge): Unit = {
    if (!filterMask(lim, blim, e)) return
    val hev = isHev(thr, e)
    val ps1 = e.get(-2) - 128; val ps0 = e.get(-1) - 128
    val qs0 = e.get(0) - 128; val qs1 = e.get(1) - 128
    val f = scClamp((if (hev) scClamp(ps1 - qs1) else 0) + 3 * (qs0 - ps0))
    val f1 = scClamp(f + 4) >> 3
    val f2 = scClamp(f + 3) >> 3
    e.set(0, scClamp(qs0 - f1) + 128)
    e.set(-1, scClamp(ps0 + f2) + 128)
    if (!hev) {
      val a = (f1 + 1) >> 1
      e.set(1, scClamp(qs1 - a) + 128)
      e.set(-2, scClamp(ps1 + a) + 128)
    }
  }

  /** Macroblock-edge filter (§15.3): the hev-gated short adjustment of
    * p0/q0 plus the 27/18/9-weighted three-tap taper applied only
    * without high edge variance.
    */
  private def mbEdgeFilter(lim: Int, blim: Int, thr: Int, e: Edge): Unit = {
    if (!filterMask(lim, blim, e)) return
    val hev = isHev(thr, e)
    val ps2 = e.get(-3) - 128; val ps1 = e.get(-2) - 128; val ps0 = e.get(-1) - 128
    val qs0 = e.get(0) - 128; val qs1 = e.get(1) - 128; val qs2 = e.get(2) - 128
    val f = scClamp(scClamp(ps1 - qs1) + 3 * (qs0 - ps0))
    val fh = if (hev) f else 0
    val f1 = scClamp(fh + 4) >> 3
    val f2 = scClamp(fh + 3) >> 3
    val q0s = scClamp(qs0 - f1)
    val p0s = scClamp(ps0 + f2)
    val fw = if (hev) 0 else f
    var u = scClamp((63 + fw * 27) >> 7)
    e.set(0, scClamp(q0s - u) + 128)
    e.set(-1, scClamp(p0s + u) + 128)
    u = scClamp((63 + fw * 18) >> 7)
    e.set(1, scClamp(qs1 - u) + 128)
    e.set(-2, scClamp(ps1 + u) + 128)
    u = scClamp((63 + fw * 9) >> 7)
    e.set(2, scClamp(qs2 - u) + 128)
    e.set(-3, scClamp(ps2 + u) + 128)
  }

  /** Simple filter (§15.4, filter_type 1, luma only): cross-edge budget
    * mask, adjusts only p0/q0.
    */
  private def simpleFilter(blim: Int, e: Edge): Unit = {
    if (math.abs(e.get(-1) - e.get(0)) * 2 +
      math.abs(e.get(-2) - e.get(1)) / 2 > blim) return
    val ps1 = e.get(-2) - 128; val ps0 = e.get(-1) - 128
    val qs0 = e.get(0) - 128; val qs1 = e.get(1) - 128
    val f = scClamp(scClamp(ps1 - qs1) + 3 * (qs0 - ps0))
    e.set(0, scClamp(qs0 - (scClamp(f + 4) >> 3)) + 128)
    e.set(-1, scClamp(ps0 + (scClamp(f + 3) >> 3)) + 128)
  }

  /** In-place frame loop filter over the luma plane, §15.1 order: MBs in
    * raster order — left MB edge, internal vertical edges at x+4/8/12,
    * top MB edge, internal horizontal edges at y+4/8/12. Internal edges
    * are skipped for macroblocks that decoded no coefficients; a level-0
    * macroblock is not filtered at all.
    */
  private def loopFilterLuma(luma: Array[Byte], stride: Int, mbW: Int, mbH: Int,
                             levels: Array[Int], hasCoeffs: Array[Boolean],
                             sharpness: Int, simple: Boolean): Unit = {
    var mby = 0
    while (mby < mbH) {
      var mbx = 0
      while (mbx < mbW) {
        val level = levels(mby * mbW + mbx)
        if (level > 0) {
          val il = interiorLimit(level, sharpness)
          val mblim = (level + 2) * 2 + il
          val sblim = level * 2 + il
          val thr = hevThreshKey(level)
          val x0 = mbx * 16
          val y0 = mby * 16
          val internal = hasCoeffs(mby * mbW + mbx)
          if (mbx > 0) {
            var r = 0
            while (r < 16) {
              val e = new Edge(luma, (y0 + r) * stride + x0, 1)
              if (simple) simpleFilter(mblim, e) else mbEdgeFilter(il, mblim, thr, e)
              r += 1
            }
          }
          if (internal) {
            var dx = 4
            while (dx <= 12) {
              var r = 0
              while (r < 16) {
                val e = new Edge(luma, (y0 + r) * stride + x0 + dx, 1)
                if (simple) simpleFilter(sblim, e) else normalFilter(il, sblim, thr, e)
                r += 1
              }
              dx += 4
            }
          }
          if (mby > 0) {
            var c = 0
            while (c < 16) {
              val e = new Edge(luma, y0 * stride + x0 + c, stride)
              if (simple) simpleFilter(mblim, e) else mbEdgeFilter(il, mblim, thr, e)
              c += 1
            }
          }
          if (internal) {
            var dy = 4
            while (dy <= 12) {
              var c = 0
              while (c < 16) {
                val e = new Edge(luma, (y0 + dy) * stride + x0 + c, stride)
                if (simple) simpleFilter(sblim, e) else normalFilter(il, sblim, thr, e)
                c += 1
              }
              dy += 4
            }
          }
        }
        mbx += 1
      }
      mby += 1
    }
  }

  // ---- intra prediction (§12.2) ------------------------------------------

  /** Whole-block DC/V/H/TM prediction of the n×n block at macroblock
    * (mbx, mby) in `plane` (n = 16 luma, 8 chroma). Frame-border
    * conventions per the spec: rows above the frame read 127, columns
    * left of it 129; the above-left corner is 127 on the top row (the
    * border row extends over the corner) and 129 in the left column
    * below it (the corner sample is the above row's left-border pixel).
    * DC availability: borders do NOT contribute — one-sided DC averages
    * the available side, both-missing predicts 128.
    */
  private[graft] def predictBlock(plane: Array[Byte], stride: Int,
                                  mbx: Int, mby: Int, n: Int, mode: Int): Unit = {
    val x0 = mbx * n
    val y0 = mby * n
    def above(j: Int): Int =
      if (mby == 0) 127 else plane((y0 - 1) * stride + x0 + j) & 0xFF
    def left(i: Int): Int =
      if (mbx == 0) 129 else plane((y0 + i) * stride + x0 - 1) & 0xFF
    val corner =
      if (mby == 0) 127
      else if (mbx == 0) 129
      else plane((y0 - 1) * stride + x0 - 1) & 0xFF
    mode match {
      case DcPred =>
        val dc =
          if (mbx == 0 && mby == 0) 128
          else {
            var s = 0
            var k = 0
            if (mby > 0) { while (k < n) { s += above(k); k += 1 }; k = 0 }
            if (mbx > 0) { while (k < n) { s += left(k); k += 1 } }
            val cnt = (if (mby > 0) n else 0) + (if (mbx > 0) n else 0)
            (s + cnt / 2) / cnt // n or 2n are powers of two: exact shift
          }
        var i = 0
        while (i < n) {
          java.util.Arrays.fill(plane, (y0 + i) * stride + x0,
            (y0 + i) * stride + x0 + n, dc.toByte)
          i += 1
        }
      case VPred =>
        var i = 0
        while (i < n) {
          var j = 0
          while (j < n) { plane((y0 + i) * stride + x0 + j) = above(j).toByte; j += 1 }
          i += 1
        }
      case HPred =>
        var i = 0
        while (i < n) {
          java.util.Arrays.fill(plane, (y0 + i) * stride + x0,
            (y0 + i) * stride + x0 + n, left(i).toByte)
          i += 1
        }
      case TmPred =>
        var i = 0
        while (i < n) {
          val l = left(i)
          var j = 0
          while (j < n) {
            val v = l + above(j) - corner
            plane((y0 + i) * stride + x0 + j) =
              (if (v < 0) 0 else if (v > 255) 255 else v).toByte
            j += 1
          }
          i += 1
        }
      case _ => throw new IllegalStateException(s"unsupported mode $mode")
    }
  }

  // ---- coefficient decode (§13.3) -----------------------------------------

  /** Decode one block's tokens from `d`, dequantize into `out` (raster
    * order via zigzag), starting at scan position `first` (1 for Y
    * blocks whose DC lives in Y2). `tp` = probs for this block type
    * (band × ctx × node). Returns the has-nonzero flag that becomes the
    * above/left context for neighboring blocks.
    */
  /** Returns `(eob << 1) | anyNz`. `eob` is the token position where EOB
    * occurred (`first`..16 — the count of coefficient positions consumed,
    * ZERO runs included); `anyNz` is whether any nonzero VALUE was
    * decoded. The two differ exactly on a block coded as ZERO tokens then
    * EOB (legal, encoder-wasteful): its eob exceeds `first` but it has no
    * nonzero coefficient. The anyNz bit feeds the §13.3 above/left
    * nonzero contexts (unchanged semantics); the eob feeds the per-MB
    * eobtotal that gates internal loop-filter edges (§15.2) the way
    * libvpx does — conformant decoders DO filter the internal edges of
    * such a block.
    */
  private[graft] def decodeCoeffs(d: BoolDecoder, tp: Array[Array[Array[Int]]],
                                  ctx0: Int, first: Int, out: Array[Int],
                                  dcMul: Int, acMul: Int): Int = {
    var c = first
    var ctx = ctx0
    var anyNz = false
    var skipEob = false
    while (c < 16) {
      val p = tp(CoeffBands(c))(ctx)
      val tok = d.tree(TokenTree, p, if (skipEob) 2 else 0)
      if (tok == DctEob) return (c << 1) | (if (anyNz) 1 else 0)
      if (tok == DctZero) {
        ctx = 0
        skipEob = true
        c += 1
      } else {
        skipEob = false
        var v =
          if (tok <= DctFour) tok // ONE..FOUR code their value directly
          else {
            val ci = tok - DctCat1
            val probs = CatProbs(ci)
            var extra = 0
            var i = 0
            while (i < probs.length) { extra = (extra << 1) | d.bool(probs(i)); i += 1 }
            CatBase(ci) + extra
          }
        ctx = if (v == 1) 1 else 2
        if (d.bool(128) == 1) v = -v
        out(Zigzag(c)) = v * (if (c == 0) dcMul else acMul)
        anyNz = true
        c += 1
      }
    }
    (16 << 1) | (if (anyNz) 1 else 0)
  }

  // ---- frame decode ---------------------------------------------------------

  private def clampQ(q: Int): Int = if (q < 0) 0 else if (q > 127) 127 else q

  /** Parse the WebM container ONCE and return a per-frame pixel decoder:
    * (frame count, idx → (width, height, luma)) — the EBML walk is paid
    * once, not once per frame, so whole-video feature extraction stays
    * O(frames) in demux work (mirrors [[H264.frameDecoder]]).
    */
  def frameDecoder(payload: Array[Byte])
      : Option[(Int, Int => Option[(Int, Int, Array[Byte])])] = {
    if (payload == null || payload.length < 8) return None
    try {
      val (codec, spans) = Multimodal.webmFrameBytes(payload).getOrElse(return None)
      if (codec != "V_VP8") return None
      val dec = (idx: Int) => {
        if (idx < 0 || idx >= spans.length) None
        else {
          val (s, len) = spans(idx)
          if (s < 0 || len <= 0 || s.toLong + len > payload.length) None
          else decodeKeyframe(payload, s, s + len)
        }
      }
      Some((spans.length, dec))
    } catch { case _: Exception => None }
  }

  /** Decode frame `idx` of a WebM payload to (width, height, luma
    * plane). Real pixels for VP8 keyframes within the documented scope;
    * None (honest degrade) otherwise — see the object doc. One-shot form
    * of [[frameDecoder]] (re-walks the container per call).
    */
  def decodeFrame(payload: Array[Byte], idx: Int): Option[(Int, Int, Array[Byte])] =
    if (idx < 0) None else frameDecoder(payload).flatMap(_._2(idx))

  /** WebP still image: the RIFF/WEBP wrapper around either a VP8
    * keyframe ('VP8 ' chunk — [[decodeKeyframe]], lossy) or a VP8L
    * lossless bitstream ('VP8L' chunk — [[Vp8l.decode]], returning true
    * RGB converted here to a Rec.601 full-range luma plane, the same
    * weights [[Multimodal]]'s ImageIO path uses). VP8X (extended/
    * animated) wrappers are walked chunk-by-chunk, so an embedded
    * still-image chunk still decodes; anything else keeps the honest
    * degrade.
    */
  def decodeWebP(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 20) return None
    def fourcc(off: Int) =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (fourcc(0) != "RIFF" || fourcc(8) != "WEBP") return None
    try {
      var off = 12
      while (off + 8 <= payload.length) {
        val tag = fourcc(off)
        val size = (payload(off + 4) & 0xFF) | ((payload(off + 5) & 0xFF) << 8) |
          ((payload(off + 6) & 0xFF) << 16) | ((payload(off + 7) & 0xFF) << 24)
        if (size < 0 || off + 8 + size > payload.length) return None
        if (tag == "VP8 ") return decodeKeyframe(payload, off + 8, off + 8 + size)
        if (tag == "VP8L")
          return Vp8l.decode(payload, off + 8, off + 8 + size).map {
            case (w, h, argb) =>
              val luma = new Array[Byte](w * h)
              var i = 0
              while (i < argb.length) {
                val p = argb(i)
                val y = 0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) +
                  0.114 * (p & 0xFF)
                luma(i) = math.round(y).toInt.min(255).toByte
                i += 1
              }
              (w, h, luma)
          }
        off += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
      }
      None
    } catch { case _: Exception => None }
  }

  /** Decode one VP8 keyframe bitstream in `b[start, end)`. */
  private[graft] def decodeKeyframe(b: Array[Byte], start: Int,
                                    end: Int): Option[(Int, Int, Array[Byte])] = {
    try {
      if (end - start < 10) return None
      // frame tag (§9.1): 19-bit first partition size, 3-bit version,
      // inverted key flag, little-endian
      val tag = (b(start) & 0xFF) | ((b(start + 1) & 0xFF) << 8) |
        ((b(start + 2) & 0xFF) << 16)
      if ((tag & 1) != 0) return None // inter frame: honest degrade
      if (((tag >> 1) & 7) > 3) return None // reserved version
      val firstPartSize = (tag >> 5) & 0x7FFFF
      if ((b(start + 3) & 0xFF) != 0x9D || (b(start + 4) & 0xFF) != 0x01 ||
        (b(start + 5) & 0xFF) != 0x2A) return None // keyframe start code
      val w = ((b(start + 6) & 0xFF) | ((b(start + 7) & 0xFF) << 8)) & 0x3FFF
      val h = ((b(start + 8) & 0xFF) | ((b(start + 9) & 0xFF) << 8)) & 0x3FFF
      if (w == 0 || h == 0 || w > 4096 || h > 4096) return None // hostile-header cap
      val p1s = start + 10
      val p1e = p1s + firstPartSize
      if (firstPartSize <= 0 || p1e > end) return None
      val hd = new BoolDecoder(b, p1s, p1e)

      // --- keyframe header (§9.2–§9.11) ---
      if (hd.bool(128) != 0) return None // color_space: 1 is reserved
      hd.bool(128) // clamping_type: we clamp unconditionally
      // segmentation (§9.3); the abs/delta mode covers BOTH feature
      // tables (quantizer and loop-filter level)
      val segQ = new Array[Int](4)
      val segLf = new Array[Int](4)
      var segAbs = false
      var updateMap = false
      val segTreeProbs = Array(255, 255, 255)
      val segEnabled = hd.bool(128) == 1
      if (segEnabled) {
        updateMap = hd.bool(128) == 1
        val updateData = hd.bool(128) == 1
        if (updateData) {
          segAbs = hd.bool(128) == 1
          var i = 0
          while (i < 4) { if (hd.bool(128) == 1) segQ(i) = hd.signedLiteral(7); i += 1 }
          i = 0
          while (i < 4) { if (hd.bool(128) == 1) segLf(i) = hd.signedLiteral(6); i += 1 }
        }
        if (updateMap) {
          var i = 0
          while (i < 3) { if (hd.bool(128) == 1) segTreeProbs(i) = hd.literal(8); i += 1 }
        }
      }
      // loop filter (§9.4)
      val simpleFilterType = hd.bool(128) == 1
      val filterLevel = hd.literal(6)
      val sharpness = hd.literal(3)
      var lfAdjEnabled = false
      var refLfDeltaIntra = 0 // ref-frame slot 0 = intra; keyframes are all-intra
      if (hd.bool(128) == 1) { // loop_filter_adj_enable
        lfAdjEnabled = true
        if (hd.bool(128) == 1) { // mode_ref_lf_delta_update
          var i = 0
          while (i < 4) {
            if (hd.bool(128) == 1) {
              val d = hd.signedLiteral(6)
              if (i == 0) refLfDeltaIntra = d
            }
            i += 1
          }
          i = 0
          // mode deltas: slot 0 applies only to B_PRED (degrades anyway)
          while (i < 4) { if (hd.bool(128) == 1) hd.signedLiteral(6); i += 1 }
        }
      }
      // token partitions (§9.5)
      val nParts = 1 << hd.literal(2)
      val sizesBase = p1e
      var off = sizesBase + 3 * (nParts - 1)
      if (off > end) return None
      val partStart = new Array[Int](nParts)
      val partEnd = new Array[Int](nParts)
      var pi = 0
      while (pi < nParts - 1) {
        val o = sizesBase + 3 * pi
        val sz = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16)
        if (off + sz > end) return None
        partStart(pi) = off
        partEnd(pi) = off + sz
        off += sz
        pi += 1
      }
      partStart(nParts - 1) = off
      partEnd(nParts - 1) = end
      if (off >= end) return None
      // quantizers (§9.6)
      val yAcQi = hd.literal(7)
      def qDelta(): Int = if (hd.bool(128) == 1) hd.signedLiteral(4) else 0
      val yDcDelta = qDelta()
      val y2DcDelta = qDelta()
      val y2AcDelta = qDelta()
      val uvDcDelta = qDelta()
      val uvAcDelta = qDelta()
      hd.bool(128) // refresh_entropy_probs (single-frame decode: ignored)
      // coefficient probability updates (§13.4)
      val probs = defaultCoeffProbsCopy()
      var i = 0
      while (i < 4) {
        var j = 0
        while (j < 8) {
          var k = 0
          while (k < 3) {
            var l = 0
            while (l < 11) {
              if (hd.bool(coeffUpdateProbs(i)(j)(k)(l)) == 1)
                probs(i)(j)(k)(l) = hd.literal(8)
              l += 1
            }
            k += 1
          }
          j += 1
        }
        i += 1
      }
      val mbNoCoeffSkip = hd.bool(128) == 1
      val probSkipFalse = if (mbNoCoeffSkip) hd.literal(8) else 0

      // --- per-MB keyframe mode records (§11.2), raster order ---
      val mbW = (w + 15) >> 4
      val mbH = (h + 15) >> 4
      val nMbs = mbW * mbH
      val yModes = new Array[Byte](nMbs)
      val uvModes = new Array[Byte](nMbs)
      val skipMb = new Array[Boolean](nMbs)
      val segIds = new Array[Byte](nMbs)
      var mb = 0
      while (mb < nMbs) {
        if (updateMap) segIds(mb) = hd.tree(SegTree, segTreeProbs).toByte
        if (mbNoCoeffSkip) skipMb(mb) = hd.bool(probSkipFalse) == 1
        val ym = hd.tree(KfYModeTree, KfYModeProb)
        if (ym == BPred) return None // 4x4 intra: next increment
        yModes(mb) = ym.toByte
        uvModes(mb) = hd.tree(UvModeTree, KfUvModeProb).toByte
        mb += 1
      }

      // --- token decode + reconstruction ---
      val lumaW = mbW * 16
      val luma = new Array[Byte](lumaW * mbH * 16)
      val chromaW = mbW * 8
      val uPlane = new Array[Byte](chromaW * mbH * 8)
      val vPlane = new Array[Byte](chromaW * mbH * 8)
      val parts = Array.tabulate(nParts)(p => new BoolDecoder(b, partStart(p), partEnd(p)))
      // above nonzero contexts, per 4x4 column across the frame
      val aboveY = new Array[Boolean](mbW * 4)
      val aboveU = new Array[Boolean](mbW * 2)
      val aboveV = new Array[Boolean](mbW * 2)
      val aboveY2 = new Array[Boolean](mbW)
      val coeffs = Array.ofDim[Int](25, 16) // 0-15 Y, 16-19 U, 20-23 V, 24 Y2
      val dcOut = new Array[Int](16)
      // loop-filter inputs gathered during the token pass
      val lfLevels = new Array[Int](nMbs)
      val mbHasCoeffs = new Array[Boolean](nMbs)
      def lfLevelOf(segId: Int): Int = {
        var lvl =
          if (segEnabled) { if (segAbs) segLf(segId) else filterLevel + segLf(segId) }
          else filterLevel
        lvl = math.max(0, math.min(63, lvl))
        if (lfAdjEnabled) lvl = math.max(0, math.min(63, lvl + refLfDeltaIntra))
        lvl
      }
      var mby = 0
      while (mby < mbH) {
        val td = parts(mby & (nParts - 1))
        val leftY = new Array[Boolean](4)
        val leftU = new Array[Boolean](2)
        val leftV = new Array[Boolean](2)
        var leftY2 = false
        var mbx = 0
        while (mbx < mbW) {
          val mbi = mby * mbW + mbx
          lfLevels(mbi) = lfLevelOf(segIds(mbi))
          var bi = 0
          while (bi < 25) { java.util.Arrays.fill(coeffs(bi), 0); bi += 1 }
          if (skipMb(mbi)) {
            // no tokens; every context this MB owns resets (incl. Y2 —
            // all keyframe non-B_PRED MBs carry a Y2 block)
            var k = 0
            while (k < 4) { aboveY(mbx * 4 + k) = false; leftY(k) = false; k += 1 }
            k = 0
            while (k < 2) {
              aboveU(mbx * 2 + k) = false; leftU(k) = false
              aboveV(mbx * 2 + k) = false; leftV(k) = false
              k += 1
            }
            aboveY2(mbx) = false
            leftY2 = false
          } else {
            val q = clampQ(
              if (segEnabled) { if (segAbs) segQ(segIds(mbi)) else yAcQi + segQ(segIds(mbi)) }
              else yAcQi)
            val y1dc = DcQLookup(clampQ(q + yDcDelta))
            val y1ac = AcQLookup(q)
            val y2dc = DcQLookup(clampQ(q + y2DcDelta)) * 2
            val y2ac = math.max(8, AcQLookup(clampQ(q + y2AcDelta)) * 155 / 100)
            val uvdc = math.min(132, DcQLookup(clampQ(q + uvDcDelta)))
            val uvac = AcQLookup(clampQ(q + uvAcDelta))
            // Y2 first. eobTotal accumulates every block's EOB position —
            // the libvpx internal-edge gate: tokens CONSUMED (zero runs
            // included) decide filtering, not nonzero values, so a block
            // legally coded as ZERO tokens then EOB still filters.
            val ctx2 = (if (aboveY2(mbx)) 1 else 0) + (if (leftY2) 1 else 0)
            val r2 = decodeCoeffs(td, probs(1), ctx2, 0, coeffs(24), y2dc, y2ac)
            val nz2 = (r2 & 1) == 1
            var eobTotal = r2 >> 1
            aboveY2(mbx) = nz2
            leftY2 = nz2
            // 16 Y blocks (type 0, first coeff 1): each starts at position
            // 1, so an immediately-EOB'd block reports eob 1 — subtract
            // the implicit position per block (libvpx's `eobtotal -= 16`)
            var sb = 0
            while (sb < 16) {
              val bx = sb & 3
              val by = sb >> 2
              val ctx = (if (aboveY(mbx * 4 + bx)) 1 else 0) + (if (leftY(by)) 1 else 0)
              val r = decodeCoeffs(td, probs(0), ctx, 1, coeffs(sb), y1dc, y1ac)
              val nz = (r & 1) == 1
              eobTotal += (r >> 1) - 1
              aboveY(mbx * 4 + bx) = nz
              leftY(by) = nz
              sb += 1
            }
            // 4 U then 4 V (type 2)
            sb = 0
            while (sb < 4) {
              val bx = sb & 1
              val by = sb >> 1
              val ctx = (if (aboveU(mbx * 2 + bx)) 1 else 0) + (if (leftU(by)) 1 else 0)
              val r = decodeCoeffs(td, probs(2), ctx, 0, coeffs(16 + sb), uvdc, uvac)
              val nz = (r & 1) == 1
              eobTotal += r >> 1
              aboveU(mbx * 2 + bx) = nz
              leftU(by) = nz
              sb += 1
            }
            sb = 0
            while (sb < 4) {
              val bx = sb & 1
              val by = sb >> 1
              val ctx = (if (aboveV(mbx * 2 + bx)) 1 else 0) + (if (leftV(by)) 1 else 0)
              val r = decodeCoeffs(td, probs(2), ctx, 0, coeffs(20 + sb), uvdc, uvac)
              val nz = (r & 1) == 1
              eobTotal += r >> 1
              aboveV(mbx * 2 + bx) = nz
              leftV(by) = nz
              sb += 1
            }
            // internal loop-filter edges apply only to MBs that consumed
            // coefficient tokens (§15.1/libvpx: eobtotal == 0 ⇒ treat as
            // skipped; zero-valued tokens still count as consumed)
            mbHasCoeffs(mbi) = eobTotal > 0
            // Y2 → per-subblock DC (§14.3)
            inverseWht(coeffs(24), dcOut)
            var kk = 0
            while (kk < 16) { coeffs(kk)(0) = dcOut(kk); kk += 1 }
          }
          // reconstruct: predict whole MB from decoded neighbors, then
          // add residuals (all-zero blocks add exactly zero)
          predictBlock(luma, lumaW, mbx, mby, 16, yModes(mbi))
          var sb = 0
          while (sb < 16) {
            idctAdd(luma, lumaW, mbx * 16 + (sb & 3) * 4, mby * 16 + (sb >> 2) * 4, coeffs(sb))
            sb += 1
          }
          predictBlock(uPlane, chromaW, mbx, mby, 8, uvModes(mbi))
          predictBlock(vPlane, chromaW, mbx, mby, 8, uvModes(mbi))
          sb = 0
          while (sb < 4) {
            idctAdd(uPlane, chromaW, mbx * 8 + (sb & 1) * 4, mby * 8 + (sb >> 1) * 4, coeffs(16 + sb))
            idctAdd(vPlane, chromaW, mbx * 8 + (sb & 1) * 4, mby * 8 + (sb >> 1) * 4, coeffs(20 + sb))
            sb += 1
          }
          mbx += 1
        }
        mby += 1
      }
      // deblock (in place, full plane), then crop to declared dimensions
      loopFilterLuma(luma, lumaW, mbW, mbH, lfLevels, mbHasCoeffs,
        sharpness, simpleFilterType)
      val out = new Array[Byte](w * h)
      var row = 0
      while (row < h) {
        System.arraycopy(luma, row * lumaW, out, row * w, w)
        row += 1
      }
      Some((w, h, out))
    } catch { case _: Exception => None }
  }
}
