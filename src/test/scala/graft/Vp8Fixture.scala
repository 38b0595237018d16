package graft

import graft.multimodal.Vp8Tables

/** In-memory VP8-in-WebM fixture builder for the multimodal video specs:
  * a minimal Matroska wrap around keyframes encoded with an INDEPENDENT
  * arithmetic encoder. The engine's bool decoder (RFC 6386 §7) is a
  * carry-free sliding-window decoder; this encoder is instead written as
  * a textbook arbitrary-precision arithmetic coder (BigInt low bound +
  * 8-bit range), so encoder/decoder agreement is evidence the two
  * transcriptions implement the same interval arithmetic, not a copy of
  * one another. The container ships no VP8 encoder (zero egress), so the
  * fixture exercises the engine's real header/mode/token machinery the
  * same way VideoFixture does for H.264.
  */
object Vp8Fixture {

  // ---- independent boolean encoder -------------------------------------

  /** Arithmetic encoder over the same per-symbol split arithmetic as the
    * decoder: split = 1 + ((range-1)·prob >> 8); bit 1 takes the upper
    * interval. `low` is exact (BigInt); flushing emits the final lower
    * bound, which by the interval invariant is a valid code point.
    */
  final class BoolEncoder {
    private var low = BigInt(0)
    private var range = 255
    private var shifts = 0

    def bool(prob: Int, bit: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { low += split; range -= split }
      else range = split
      while (range < 128) { low <<= 1; range <<= 1; shifts += 1 }
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }

    def signedLiteral(v: Int, n: Int): Unit = {
      literal(math.abs(v), n)
      bool(128, if (v < 0) 1 else 0)
    }

    /** Emit the tree path for `sym` (mirrors the decoder's walk). A
      * non-positive entry is a leaf for symbol -entry (so a stored 0 is
      * the leaf of symbol 0, never a pointer to the root).
      */
    def tree(t: Array[Int], p: Array[Int], sym: Int, startNode: Int = 0): Unit = {
      def path(node: Int): Option[List[(Int, Int)]] = {
        var b = 0
        while (b < 2) {
          val nxt = t(node + b)
          if (nxt <= 0) {
            if (-nxt == sym) return Some(List((node, b)))
          } else path(nxt) match {
            case Some(rest) => return Some((node, b) :: rest)
            case None => ()
          }
          b += 1
        }
        None
      }
      val steps = path(startNode).getOrElse(
        sys.error(s"symbol $sym unreachable from node $startNode"))
      steps.foreach { case (node, b) => bool(p(node >> 1), b) }
    }

    /** Final stream: `low`'s (shifts + 8) fractional bits, zero-padded
      * to bytes — a point inside the final interval, as required.
      */
    def bytes: Array[Byte] = {
      val totalBits = shifts + 8
      val padBits = (8 - totalBits % 8) % 8
      val v = low << padBits
      val nBytes = (totalBits + padBits) / 8
      Array.tabulate(nBytes)(i => ((v >> (8 * (nBytes - 1 - i))) & 0xFF).toByte)
    }
  }

  // ---- macroblock spec ---------------------------------------------------

  /** One macroblock: prediction modes + coefficient LEVELS (pre-dequant,
    * scan order). `y2` carries the 16 luma DC levels; each `y` subblock's
    * scan position 0 is unused (its DC travels in y2). Modes are
    * [[Vp8Tables]] constants (B_PRED only to exercise the degrade).
    */
  final case class Mb(
      yMode: Int = Vp8Tables.DcPred,
      uvMode: Int = Vp8Tables.DcPred,
      skip: Boolean = false,
      segId: Int = 0,
      y2: Array[Int] = new Array[Int](16),
      y: Array[Array[Int]] = Array.fill(16)(new Array[Int](16)),
      u: Array[Array[Int]] = Array.fill(4)(new Array[Int](16)),
      v: Array[Array[Int]] = Array.fill(4)(new Array[Int](16)))

  /** Frame-level knobs (quantizer index, deltas, partitions, optional
    * per-segment quantizer table).
    */
  final case class FrameCfg(
      q: Int = 20,
      yDcDelta: Int = 0, y2DcDelta: Int = 0, y2AcDelta: Int = 0,
      uvDcDelta: Int = 0, uvAcDelta: Int = 0,
      nPartsLog2: Int = 0,
      mbNoCoeffSkip: Boolean = true,
      probSkipFalse: Int = 200,
      filterLevel: Int = 0,
      sharpness: Int = 0,
      simpleFilter: Boolean = false,
      refLfDeltaIntra: Option[Int] = None, // Some(d) enables lf adjustments
      segment: Option[(Array[Int], Boolean)] = None, // (4 q values, abs?)
      segmentLf: Array[Int] = new Array[Int](4)) // per-segment lf values/deltas

  // ---- token encoding (mirror of the decoder's §13.3 state machine) -----

  private def tokenOf(mag: Int): Int = mag match {
    case 0 => Vp8Tables.DctZero
    case m if m <= 4 => m
    case m if m <= 6 => Vp8Tables.DctCat1
    case m if m <= 10 => Vp8Tables.DctCat2
    case m if m <= 18 => Vp8Tables.DctCat3
    case m if m <= 34 => Vp8Tables.DctCat4
    case m if m <= 66 => Vp8Tables.DctCat5
    case _ => Vp8Tables.DctCat6
  }

  /** Encode one block's levels (scan order, from `first`); returns the
    * has-nonzero flag for neighbor contexts.
    */
  private def encodeCoeffs(e: BoolEncoder, tp: Array[Array[Array[Int]]],
                           ctx0: Int, first: Int, levels: Array[Int]): Boolean = {
    require(levels.length == 16)
    var lastNz = -1
    var c = first
    while (c < 16) { if (levels(c) != 0) lastNz = c; c += 1 }
    if (lastNz < 0) {
      // empty block: a single EOB (never follows a ZERO here)
      e.tree(Vp8Tables.TokenTree, tp(Vp8Tables.CoeffBands(first))(ctx0), Vp8Tables.DctEob)
      return false
    }
    var ctx = ctx0
    var skipEob = false
    c = first
    while (c <= lastNz) {
      val lvl = levels(c)
      val mag = math.abs(lvl)
      val tok = tokenOf(mag)
      val p = tp(Vp8Tables.CoeffBands(c))(ctx)
      e.tree(Vp8Tables.TokenTree, p, tok, if (skipEob) 2 else 0)
      if (tok == Vp8Tables.DctZero) {
        ctx = 0
        skipEob = true
      } else {
        skipEob = false
        if (tok >= Vp8Tables.DctCat1) {
          val ci = tok - Vp8Tables.DctCat1
          val probs = Vp8Tables.CatProbs(ci)
          val extra = mag - Vp8Tables.CatBase(ci)
          require(extra >= 0 && extra < (1 << probs.length), s"magnitude $mag out of cat range")
          var i = 0
          while (i < probs.length) {
            e.bool(probs(i), (extra >> (probs.length - 1 - i)) & 1)
            i += 1
          }
        }
        e.bool(128, if (lvl < 0) 1 else 0)
        ctx = if (mag == 1) 1 else 2
      }
      c += 1
    }
    if (lastNz < 15) // EOB never follows a ZERO by construction (lastNz nonzero)
      e.tree(Vp8Tables.TokenTree, tp(Vp8Tables.CoeffBands(lastNz + 1))(ctx), Vp8Tables.DctEob)
    true
  }

  // ---- keyframe builder ----------------------------------------------------

  /** Build a raw VP8 keyframe bitstream: `mbs` in raster order for a
    * ((w+15)/16 × (h+15)/16) grid.
    */
  def keyframe(w: Int, h: Int, mbs: Seq[Mb], cfg: FrameCfg = FrameCfg()): Array[Byte] = {
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    require(mbs.length == mbW * mbH, s"need ${mbW * mbH} MBs, got ${mbs.length}")
    val hd = new BoolEncoder
    hd.bool(128, 0) // color_space
    hd.bool(128, 0) // clamping_type
    cfg.segment match {
      case None => hd.bool(128, 0)
      case Some((qs, abs)) =>
        hd.bool(128, 1) // segmentation_enabled
        hd.bool(128, 1) // update_mb_segmentation_map
        hd.bool(128, 1) // update_segment_feature_data
        hd.bool(128, if (abs) 1 else 0)
        qs.foreach { qv => hd.bool(128, 1); hd.signedLiteral(qv, 7) }
        cfg.segmentLf.foreach { lv =>
          if (lv == 0) hd.bool(128, 0)
          else { hd.bool(128, 1); hd.signedLiteral(lv, 6) }
        }
        (0 until 3).foreach(_ => hd.bool(128, 0)) // default tree probs (255)
    }
    hd.bool(128, if (cfg.simpleFilter) 1 else 0) // filter_type
    hd.literal(cfg.filterLevel, 6)
    hd.literal(cfg.sharpness, 3)
    cfg.refLfDeltaIntra match {
      case None => hd.bool(128, 0) // loop_filter_adj_enable
      case Some(d) =>
        hd.bool(128, 1) // enable
        hd.bool(128, 1) // mode_ref_lf_delta_update
        hd.bool(128, 1); hd.signedLiteral(d, 6) // ref slot 0 (intra)
        (0 until 3).foreach(_ => hd.bool(128, 0)) // other ref slots
        (0 until 4).foreach(_ => hd.bool(128, 0)) // mode deltas
    }
    hd.literal(cfg.nPartsLog2, 2)
    hd.literal(cfg.q, 7)
    def delta(v: Int): Unit =
      if (v == 0) hd.bool(128, 0) else { hd.bool(128, 1); hd.signedLiteral(v, 4) }
    delta(cfg.yDcDelta); delta(cfg.y2DcDelta); delta(cfg.y2AcDelta)
    delta(cfg.uvDcDelta); delta(cfg.uvAcDelta)
    hd.bool(128, 1) // refresh_entropy_probs
    // no coefficient prob updates: 1056 zero flags at the update probs
    for (i <- 0 until 4; j <- 0 until 8; k <- 0 until 3; l <- 0 until 11)
      hd.bool(Vp8Tables.coeffUpdateProbs(i)(j)(k)(l), 0)
    hd.bool(128, if (cfg.mbNoCoeffSkip) 1 else 0)
    if (cfg.mbNoCoeffSkip) hd.literal(cfg.probSkipFalse, 8)
    // per-MB mode records
    val segTreeProbs = Array(255, 255, 255)
    mbs.foreach { m =>
      if (cfg.segment.isDefined) hd.tree(Vp8Tables.SegTree, segTreeProbs, m.segId)
      if (cfg.mbNoCoeffSkip) hd.bool(cfg.probSkipFalse, if (m.skip) 1 else 0)
      hd.tree(Vp8Tables.KfYModeTree, Vp8Tables.KfYModeProb, m.yMode)
      if (m.yMode != Vp8Tables.BPred)
        hd.tree(Vp8Tables.UvModeTree, Vp8Tables.KfUvModeProb, m.uvMode)
    }
    val part1 = hd.bytes

    // token partitions, mirroring the decoder's context state machine
    val nParts = 1 << cfg.nPartsLog2
    val parts = Array.fill(nParts)(new BoolEncoder)
    val probs = Vp8Tables.defaultCoeffProbs
    val aboveY = new Array[Boolean](mbW * 4)
    val aboveU = new Array[Boolean](mbW * 2)
    val aboveV = new Array[Boolean](mbW * 2)
    val aboveY2 = new Array[Boolean](mbW)
    for (mby <- 0 until mbH) {
      val te = parts(mby & (nParts - 1))
      val leftY = new Array[Boolean](4)
      val leftU = new Array[Boolean](2)
      val leftV = new Array[Boolean](2)
      var leftY2 = false
      for (mbx <- 0 until mbW) {
        val m = mbs(mby * mbW + mbx)
        if (m.skip || m.yMode == Vp8Tables.BPred) {
          for (k <- 0 until 4) { aboveY(mbx * 4 + k) = false; leftY(k) = false }
          for (k <- 0 until 2) {
            aboveU(mbx * 2 + k) = false; leftU(k) = false
            aboveV(mbx * 2 + k) = false; leftV(k) = false
          }
          aboveY2(mbx) = false
          leftY2 = false
        } else {
          val ctx2 = (if (aboveY2(mbx)) 1 else 0) + (if (leftY2) 1 else 0)
          val nz2 = encodeCoeffs(te, probs(1), ctx2, 0, m.y2)
          aboveY2(mbx) = nz2; leftY2 = nz2
          for (sb <- 0 until 16) {
            val bx = sb & 3; val by = sb >> 2
            val ctx = (if (aboveY(mbx * 4 + bx)) 1 else 0) + (if (leftY(by)) 1 else 0)
            val nz = encodeCoeffs(te, probs(0), ctx, 1, m.y(sb))
            aboveY(mbx * 4 + bx) = nz; leftY(by) = nz
          }
          for (sb <- 0 until 4) {
            val bx = sb & 1; val by = sb >> 1
            val ctx = (if (aboveU(mbx * 2 + bx)) 1 else 0) + (if (leftU(by)) 1 else 0)
            val nz = encodeCoeffs(te, probs(2), ctx, 0, m.u(sb))
            aboveU(mbx * 2 + bx) = nz; leftU(by) = nz
          }
          for (sb <- 0 until 4) {
            val bx = sb & 1; val by = sb >> 1
            val ctx = (if (aboveV(mbx * 2 + bx)) 1 else 0) + (if (leftV(by)) 1 else 0)
            val nz = encodeCoeffs(te, probs(2), ctx, 0, m.v(sb))
            aboveV(mbx * 2 + bx) = nz; leftV(by) = nz
          }
        }
      }
    }
    val partBytes = parts.map(_.bytes)

    // uncompressed chunk: tag + start code + dims
    val tag = (part1.length << 5) | (0 << 4) | (0 << 1) | 0 // keyframe, version 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out += (tag & 0xFF).toByte
    out += ((tag >> 8) & 0xFF).toByte
    out += ((tag >> 16) & 0xFF).toByte
    out += 0x9D.toByte; out += 0x01.toByte; out += 0x2A.toByte
    out += (w & 0xFF).toByte; out += ((w >> 8) & 0x3F).toByte
    out += (h & 0xFF).toByte; out += ((h >> 8) & 0x3F).toByte
    out ++= part1
    partBytes.dropRight(1).foreach { pb =>
      out += (pb.length & 0xFF).toByte
      out += ((pb.length >> 8) & 0xFF).toByte
      out += ((pb.length >> 16) & 0xFF).toByte
    }
    partBytes.foreach(out ++= _)
    out.toArray
  }

  /** An inter-frame stub (tag with the key bit set) for degrade tests. */
  def interFrame(): Array[Byte] = {
    val tag = (4 << 5) | 1
    Array[Byte]((tag & 0xFF).toByte, ((tag >> 8) & 0xFF).toByte,
      ((tag >> 16) & 0xFF).toByte, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  }

  // ---- WebM mux ---------------------------------------------------------

  private def be(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte).toArray

  private def vsize(n: Int): Array[Byte] =
    if (n < 0x7F) Array((0x80 | n).toByte)
    else if (n < 0x3FFF) Array((0x40 | (n >> 8)).toByte, (n & 0xFF).toByte)
    else Array((0x20 | (n >> 16)).toByte, ((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte)

  private def el(id: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
    val p = payload.flatten.toArray
    id ++ vsize(p.length) ++ p
  }

  /** RIFF/WEBP wrap of a raw VP8 keyframe (lossy WebP still image). */
  def webp(frame: Array[Byte], chunkTag: String = "VP8 "): Array[Byte] = {
    val le = (v: Int) => Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val pad = if (frame.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    val chunk = chunkTag.getBytes("ISO-8859-1") ++ le(frame.length) ++ frame ++ pad
    "RIFF".getBytes("ISO-8859-1") ++ le(4 + chunk.length) ++
      "WEBP".getBytes("ISO-8859-1") ++ chunk
  }

  /** Wrap raw VP8 frames as a one-cluster WebM, 40 ms apart. */
  def webm(frames: Seq[Array[Byte]], codecId: String = "V_VP8"): Array[Byte] = {
    val hdr = el(Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte),
      el(Array(0x42, 0x82).map(_.toByte), "webm".getBytes("ISO-8859-1")))
    val info = el(Array(0x15, 0x49, 0xA9, 0x66).map(_.toByte),
      el(Array(0x2A, 0xD7, 0xB1).map(_.toByte), be(1000000L, 3)))
    val track = el(Array(0xAE).map(_.toByte),
      el(Array(0xD7).map(_.toByte), be(1, 1)),
      el(Array(0x83).map(_.toByte), be(1, 1)),
      el(Array(0x86).map(_.toByte), codecId.getBytes("ISO-8859-1")))
    val tracks = el(Array(0x16, 0x54, 0xAE, 0x6B).map(_.toByte), track)
    val blocks = frames.zipWithIndex.map { case (f, i) =>
      el(Array(0xA3).map(_.toByte), Array(0x81.toByte),
        be(40L * i, 2), Array(0.toByte), f)
    }
    val cluster = el(Array(0x1F, 0x43, 0xB6, 0x75).map(_.toByte),
      (el(Array(0xE7).map(_.toByte), be(0, 1)) +: blocks): _*)
    hdr ++ el(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte), info, tracks, cluster)
  }
}
