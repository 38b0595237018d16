package graft.multimodal

/** Pure-JVM H.264 (ISO/IEC 14496-10) I-frame PIXEL decode for MP4
  * payloads — the real-decode upgrade of the container-metadata-only MP4
  * path. The reference pipeline has NO video handling; this is a
  * framework-native capability of the multimodal column family (opaque
  * binary payloads + typed decode), not a reference-behavior port.
  *
  * Honest scope, stated in the schema rather than faked: the decoder
  * implements the bitstream layers in full — MP4 sample demux (stsd/avcC
  * + stsc/stsz/stco chunk-offset mapping), NAL length-prefix framing,
  * RBSP emulation-prevention unescape, exp-Golomb SPS/PPS/slice-header
  * parsing — and PIXEL reconstruction for the full CAVLC intra layer:
  * (a) I_PCM macroblocks (raw-sample coding); (b) Intra_16x16
  * macroblocks — all four §8.3.3 prediction modes, CAVLC residual
  * decoding ([[Cavlc]]), luma-DC Hadamard + scaling (§8.5.10), AC
  * scaling (§8.5.12.1), the 4x4 core inverse transform (§8.5.12.2);
  * (c) I_NxN (Intra_4x4) macroblocks — per-block §8.3.1.1
  * most-probable-mode prediction, all nine §8.3.1.2 prediction modes
  * with decode-order top-right availability and sample substitution,
  * and Table 9-4 mapped-Exp-Golomb CBP. Together that is the coding
  * real baseline-profile keyframes use. Still NOT reconstructed (a
  * slice containing them returns None and the row degrades to
  * `decoded=false`): CABAC entropy, field coding, multi-slice-group
  * streams, and non-4:2:0 chroma on the CAVLC path. This boundary is a
  * documented property of [[decodeFrame]], not a silent wrong answer —
  * features are only ever emitted from real pixels.
  *
  * Everything here is from the public spec: NAL syntax (§7.3.1), SPS
  * (§7.3.2.1), PPS (§7.3.2.2), slice header (§7.3.3), macroblock layer
  * (§7.3.5, Table 7-11), CAVLC (§9.2, tables in [[Cavlc]]), transforms
  * and scaling (§8.5), intra prediction (§8.3.1/§8.3.3), and the ISO
  * BMFF sample-table boxes (ISO/IEC 14496-12 §8.5–8.7).
  */
object H264 {

  // ---- RBSP bit reader -------------------------------------------------

  /** MSB-first bit reader over an RBSP (already emulation-unescaped). */
  private[graft] final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    def remaining: Int = b.length * 8 - pos
    def u1(): Int = {
      if (remaining < 1) throw new IllegalStateException("rbsp underrun")
      val bit = (b(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      bit
    }
    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    /** Unsigned exp-Golomb (§9.1). */
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        if (zeros > 31) throw new IllegalStateException("ue overflow")
      }
      (1 << zeros) - 1 + u(zeros)
    }
    /** Signed exp-Golomb (§9.1.1). */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAlign(): Unit = pos = (pos + 7) & ~7
    /** Aligned raw byte (I_PCM samples). */
    def alignedByte(): Int = {
      if ((pos & 7) != 0 || remaining < 8)
        throw new IllegalStateException("unaligned pcm read")
      val v = b(pos >> 3) & 0xFF
      pos += 8
      v
    }
  }

  /** RBSP extraction: drop the NAL header byte and every emulation-
    * prevention byte (0x000003 → 0x0000, §7.4.1.1).
    */
  private def rbspOf(nal: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new Array[Byte](to - from)
    var n = 0
    var i = from
    var zeros = 0
    while (i < to) {
      val v = nal(i) & 0xFF
      if (zeros >= 2 && v == 3) zeros = 0 // skip the escape byte
      else {
        out(n) = nal(i); n += 1
        zeros = if (v == 0) zeros + 1 else 0
      }
      i += 1
    }
    java.util.Arrays.copyOf(out, n)
  }

  // ---- parameter sets ---------------------------------------------------

  private[multimodal] final case class Sps(
      profileIdc: Int, widthMbs: Int, heightMbs: Int,
      log2MaxFrameNum: Int, pocType: Int, log2MaxPocLsb: Int,
      frameMbsOnly: Boolean,
      cropL: Int, cropR: Int, cropT: Int, cropB: Int,
      separateColourPlane: Boolean, chromaArrayType: Int) {
    /** Frame-cropping units per §7.4.2.1.1: CropUnitX = SubWidthC for
      * chroma formats 1/2 (both subsample horizontally ×2) and 1 for
      * monochrome / 4:4:4; CropUnitY = SubHeightC · (2 − frame_mbs_only)
      * with SubHeightC = 2 only for 4:2:0. Hardcoding the 4:2:0 ×2 for
      * every format would shift-crop monochrome/4:2:2/4:4:4 streams.
      */
    def cropUnitX: Int = if (chromaArrayType == 1 || chromaArrayType == 2) 2 else 1
    def cropUnitY: Int =
      (if (chromaArrayType == 1) 2 else 1) * (if (frameMbsOnly) 1 else 2)
    def width: Int = widthMbs * 16 - cropUnitX * (cropL + cropR)
    def height: Int = heightMbs * 16 - cropUnitY * (cropT + cropB)
  }

  private[multimodal] final case class Pps(
      spsId: Int, cabac: Boolean, bottomFieldPocPresent: Boolean,
      deblockingPresent: Boolean, redundantPresent: Boolean,
      picInitQp: Int)

  private[multimodal] def parseSps(rbsp: Array[Byte]): Sps = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    r.u(8) // level_idc
    r.ue() // seq_parameter_set_id
    var separate = false
    var chromaArrayType = 1 // 4:2:0 default when chroma_format_idc absent
    if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
        .contains(profile)) {
      val chromaFormat = r.ue()
      if (chromaFormat == 3) separate = r.u1() == 1
      chromaArrayType = if (separate) 0 else chromaFormat
      r.ue(); r.ue() // bit_depth_luma/chroma_minus8
      r.u1() // qpprime_y_zero_transform_bypass
      if (r.u1() == 1) { // seq_scaling_matrix_present
        val n = if (chromaFormat == 3) 12 else 8
        var i = 0
        while (i < n) {
          if (r.u1() == 1) skipScalingList(r, if (i < 6) 16 else 64)
          i += 1
        }
      }
    }
    val log2MaxFrameNum = r.ue() + 4
    val pocType = r.ue()
    var log2MaxPocLsb = 0
    if (pocType == 0) log2MaxPocLsb = r.ue() + 4
    else if (pocType == 1) {
      r.u1(); r.se(); r.se()
      val n = r.ue()
      var i = 0
      while (i < n) { r.se(); i += 1 }
    }
    r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num_value_allowed
    val widthMbs = r.ue() + 1
    val heightMapUnits = r.ue() + 1
    val frameMbsOnly = r.u1() == 1
    if (!frameMbsOnly) r.u1() // mb_adaptive_frame_field
    r.u1() // direct_8x8_inference
    var (cl, cr, ct, cb) = (0, 0, 0, 0)
    if (r.u1() == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
    val heightMbs = (if (frameMbsOnly) 1 else 2) * heightMapUnits
    Sps(profile, widthMbs, heightMbs, log2MaxFrameNum, pocType, log2MaxPocLsb,
      frameMbsOnly, cl, cr, ct, cb, separate, chromaArrayType)
  }

  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var last = 8
    var next = 8
    var j = 0
    while (j < size) {
      if (next != 0) next = (last + r.se() + 256) % 256
      last = if (next == 0) last else next
      j += 1
    }
  }

  private[multimodal] def parsePps(rbsp: Array[Byte]): Pps = {
    val r = new BitReader(rbsp)
    r.ue() // pic_parameter_set_id
    val spsId = r.ue()
    val cabac = r.u1() == 1
    val bottomPoc = r.u1() == 1
    val nGroups = r.ue() + 1
    if (nGroups != 1)
      throw new IllegalStateException("FMO slice groups unsupported")
    r.ue(); r.ue() // num_ref_idx_l0/l1_default_active_minus1
    r.u1() // weighted_pred
    r.u(2) // weighted_bipred_idc
    val picInitQp = 26 + r.se() // pic_init_qp_minus26
    r.se() // pic_init_qs_minus26
    r.se() // chroma_qp_index_offset
    val deblocking = r.u1() == 1
    r.u1() // constrained_intra_pred
    val redundant = r.u1() == 1
    Pps(spsId, cabac, bottomPoc, deblocking, redundant, picInitQp)
  }

  // ---- Intra16x16 + CAVLC decode machinery -------------------------------

  /** 4x4 zigzag scan (§8.5.6): zigzag index k → raster position. */
  private val ZigZag4x4 =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** normAdjust4x4 (§8.5.9), rows qP % 6, columns by position class:
    * 0 = both-even positions, 1 = both-odd, 2 = mixed.
    */
  private val NormAdjust = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  /** LevelScale4x4(m, i, j) with the FLAT (default) weightScale of 16 —
    * baseline profile has no scaling matrices.
    */
  private def levelScale(m: Int, i: Int, j: Int): Int = {
    val cls = if (i % 2 == 0 && j % 2 == 0) 0
              else if (i % 2 == 1 && j % 2 == 1) 1 else 2
    16 * NormAdjust(m)(cls)
  }

  /** Luma-DC inverse Hadamard (§8.5.10): f = H · c · H with the ±1
    * matrix; exact integer butterflies.
    */
  private def inverseHadamard4(c: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    val f = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = 4 * i
      val a = c(o) + c(o + 2); val b = c(o) - c(o + 2)
      val d = c(o + 1) - c(o + 3); val e = c(o + 1) + c(o + 3)
      t(o) = a + e; t(o + 1) = b + d; t(o + 2) = b - d; t(o + 3) = a - e
      i += 1
    }
    var j = 0
    while (j < 4) {
      val a = t(j) + t(8 + j); val b = t(j) - t(8 + j)
      val d = t(4 + j) - t(12 + j); val e = t(4 + j) + t(12 + j)
      f(j) = a + e; f(4 + j) = b + d; f(8 + j) = b - d; f(12 + j) = a - e
      j += 1
    }
    f
  }

  /** Luma-DC scaling (§8.5.10, 8-bit): applied AFTER the Hadamard. */
  private def scaleDc(f: Int, qp: Int): Int = {
    val ls = levelScale(qp % 6, 0, 0)
    if (qp >= 36) (f * ls) << (qp / 6 - 6)
    else (f * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** AC coefficient scaling (§8.5.12.1, 8-bit, flat list). */
  private def scaleAc(c: Int, qp: Int, i: Int, j: Int): Int = {
    val ls = levelScale(qp % 6, i, j)
    if (qp >= 24) (c * ls) << (qp / 6 - 4)
    else (c * ls + (1 << (3 - qp / 6))) >> (4 - qp / 6)
  }

  /** 4x4 core inverse transform (§8.5.12.2) including the final
    * (x + 32) >> 6 rounding; input d in raster order.
    */
  private def inverseTransform4x4(d: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    val out = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val o = 4 * i
      val e0 = d(o) + d(o + 2); val e1 = d(o) - d(o + 2)
      val e2 = (d(o + 1) >> 1) - d(o + 3); val e3 = d(o + 1) + (d(o + 3) >> 1)
      t(o) = e0 + e3; t(o + 1) = e1 + e2; t(o + 2) = e1 - e2; t(o + 3) = e0 - e3
      i += 1
    }
    var j = 0
    while (j < 4) {
      val g0 = t(j) + t(8 + j); val g1 = t(j) - t(8 + j)
      val g2 = (t(4 + j) >> 1) - t(12 + j); val g3 = t(4 + j) + (t(12 + j) >> 1)
      out(j) = (g0 + g3 + 32) >> 6
      out(4 + j) = (g1 + g2 + 32) >> 6
      out(8 + j) = (g1 - g2 + 32) >> 6
      out(12 + j) = (g0 - g3 + 32) >> 6
      j += 1
    }
    out
  }

  @inline private def clip1(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** Intra_16x16 luma prediction (§8.3.3): 0 vertical, 1 horizontal,
    * 2 DC (adaptive to availability), 3 plane. None when the mode
    * references an unavailable neighbor (invalid bitstream).
    */
  private def predict16x16(mode: Int, luma: Array[Byte], wPix: Int,
      mbX: Int, mbY: Int, leftAvail: Boolean,
      topAvail: Boolean): Option[Array[Int]] = {
    val pred = new Array[Int](256)
    def top(x: Int) = luma((mbY - 1) * wPix + mbX + x) & 0xFF
    def left(y: Int) = luma((mbY + y) * wPix + mbX - 1) & 0xFF
    def corner = luma((mbY - 1) * wPix + mbX - 1) & 0xFF
    mode match {
      case 0 =>
        if (!topAvail) return None
        var y = 0
        while (y < 16) { var x = 0
          while (x < 16) { pred(y * 16 + x) = top(x); x += 1 }; y += 1 }
      case 1 =>
        if (!leftAvail) return None
        var y = 0
        while (y < 16) { val v = left(y); var x = 0
          while (x < 16) { pred(y * 16 + x) = v; x += 1 }; y += 1 }
      case 2 =>
        val v =
          if (topAvail && leftAvail)
            ((0 until 16).map(top).sum + (0 until 16).map(left).sum + 16) >> 5
          else if (topAvail) ((0 until 16).map(top).sum + 8) >> 4
          else if (leftAvail) ((0 until 16).map(left).sum + 8) >> 4
          else 128
        java.util.Arrays.fill(pred, v)
      case 3 =>
        if (!topAvail || !leftAvail) return None
        val h = (0 until 8).map(x =>
          (x + 1) * (top(8 + x) - (if (x == 7) corner else top(6 - x)))).sum
        val v = (0 until 8).map(y =>
          (y + 1) * (left(8 + y) - (if (y == 7) corner else left(6 - y)))).sum
        val a = 16 * (left(15) + top(15))
        val b = (5 * h + 32) >> 6
        val c = (5 * v + 32) >> 6
        var y = 0
        while (y < 16) { var x = 0
          while (x < 16) {
            pred(y * 16 + x) = clip1((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
            x += 1 }
          y += 1 }
      case _ => return None
    }
    Some(pred)
  }

  /** Table 9-4 mapped-Exp-Golomb: codeNum → coded_block_pattern for
    * Intra_4x4 macroblocks (ChromaArrayType 1/2 column). A permutation
    * of 0..47 — CavlcSpec pins that structurally.
    */
  private[graft] val CbpIntra = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  /** Intra_4x4 luma prediction (§8.3.1.2, all nine modes) for the 4x4
    * block with top-left pixel (x0, y0). `topRightAvail` is the §8.3.1.2
    * decode-order availability of p[4..7, -1]; when false but the top row
    * is available, those samples substitute p[3, -1]. None when `mode`
    * references an unavailable edge (invalid bitstream).
    */
  private def predict4x4(mode: Int, luma: Array[Byte], wPix: Int,
      x0: Int, y0: Int, leftAvail: Boolean, topAvail: Boolean,
      topRightAvail: Boolean): Option[Array[Int]] = {
    val p = new Array[Int](16)
    // edge samples: t(-1) = corner, t(0..7) top + top-right, l(0..3) left
    def pix(x: Int, y: Int) = luma(y * wPix + x) & 0xFF
    val t = new Array[Int](9) // t(i) holds p[i-1, -1]
    if (topAvail) {
      var i = 0
      while (i < 4) { t(i + 1) = pix(x0 + i, y0 - 1); i += 1 }
      while (i < 8) {
        t(i + 1) = if (topRightAvail) pix(x0 + i, y0 - 1) else t(4)
        i += 1
      }
    }
    if (leftAvail && topAvail) t(0) = pix(x0 - 1, y0 - 1)
    val l = new Array[Int](4)
    if (leftAvail) { var i = 0
      while (i < 4) { l(i) = pix(x0 - 1, y0 + i); i += 1 } }
    @inline def T(i: Int) = t(i + 1) // T(-1) = the corner sample
    @inline def L(i: Int) = if (i < 0) t(0) else l(i) // L(-1) = corner too
    @inline def set(x: Int, y: Int, v: Int): Unit = p(y * 4 + x) = v
    mode match {
      case 0 => // Vertical
        if (!topAvail) return None
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, T(x))
      case 1 => // Horizontal
        if (!leftAvail) return None
        for (y <- 0 until 4; x <- 0 until 4) set(x, y, l(y))
      case 2 => // DC (availability-adaptive)
        val v =
          if (topAvail && leftAvail)
            ((0 until 4).map(T).sum + l.sum + 4) >> 3
          else if (topAvail) ((0 until 4).map(T).sum + 2) >> 2
          else if (leftAvail) (l.sum + 2) >> 2
          else 128
        java.util.Arrays.fill(p, v)
      case 3 => // Diagonal-Down-Left
        if (!topAvail) return None
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (x == 3 && y == 3) (T(6) + 3 * T(7) + 2) >> 2
            else (T(x + y) + 2 * T(x + y + 1) + T(x + y + 2) + 2) >> 2)
      case 4 => // Diagonal-Down-Right
        if (!topAvail || !leftAvail) return None
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (x > y) (T(x - y - 2) + 2 * T(x - y - 1) + T(x - y) + 2) >> 2
            else if (x < y)
              (L(y - x - 2) + 2 * L(y - x - 1) + L(y - x) + 2) >> 2
            else (T(0) + 2 * t(0) + l(0) + 2) >> 2)
      case 5 => // Vertical-Right
        if (!topAvail || !leftAvail) return None
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = 2 * x - y
          set(x, y,
            if (z >= 0 && z % 2 == 0)
              (T(x - (y >> 1) - 1) + T(x - (y >> 1)) + 1) >> 1
            else if (z >= 0)
              (T(x - (y >> 1) - 2) + 2 * T(x - (y >> 1) - 1) +
                T(x - (y >> 1)) + 2) >> 2
            else if (z == -1) (l(0) + 2 * t(0) + T(0) + 2) >> 2
            else (L(y - 1) + 2 * L(y - 2) + L(y - 3) + 2) >> 2)
        }
      case 6 => // Horizontal-Down
        if (!topAvail || !leftAvail) return None
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = 2 * y - x
          set(x, y,
            if (z >= 0 && z % 2 == 0)
              (L(y - (x >> 1) - 1) + L(y - (x >> 1)) + 1) >> 1
            else if (z >= 0)
              (L(y - (x >> 1) - 2) + 2 * L(y - (x >> 1) - 1) +
                L(y - (x >> 1)) + 2) >> 2
            else if (z == -1) (l(0) + 2 * t(0) + T(0) + 2) >> 2
            else (T(x - 1) + 2 * T(x - 2) + T(x - 3) + 2) >> 2)
        }
      case 7 => // Vertical-Left
        if (!topAvail) return None
        for (y <- 0 until 4; x <- 0 until 4)
          set(x, y,
            if (y % 2 == 0) (T(x + (y >> 1)) + T(x + (y >> 1) + 1) + 1) >> 1
            else (T(x + (y >> 1)) + 2 * T(x + (y >> 1) + 1) +
              T(x + (y >> 1) + 2) + 2) >> 2)
      case 8 => // Horizontal-Up
        if (!leftAvail) return None
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = x + 2 * y
          set(x, y,
            if (z < 5 && z % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
            else if (z < 5) (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
              l(y + (x >> 1) + 2) + 2) >> 2
            else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
            else l(3))
        }
      case _ => return None
    }
    Some(p)
  }

  /** nC for CAVLC coeff_token selection (§9.2.1): mean of the available
    * left/top neighbor blocks' TotalCoeff (grid value < 0 ⇒ unavailable).
    */
  private def ncOf(grid: Array[Int], stride: Int, gx: Int, gy: Int): Int = {
    val nA = if (gx > 0) grid(gy * stride + gx - 1) else -1
    val nB = if (gy > 0) grid((gy - 1) * stride + gx) else -1
    if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
    else if (nA >= 0) nA
    else if (nB >= 0) nB
    else 0
  }

  // ---- slice decode (I_PCM + CAVLC Intra_16x16 macroblocks) --------------

  /** Decode an IDR/I slice into the luma plane (cropped). Real pixels for
    * I_PCM macroblocks AND CAVLC-entropy Intra_16x16 macroblocks (all
    * four prediction modes, full residual reconstruction) — the coding
    * real baseline-profile keyframes use. None for CABAC, I_NxN
    * macroblocks, field coding, or multi-slice-group streams — the
    * honest-degrade boundary.
    */
  private[multimodal] def decodeISlice(sps: Sps, pps: Pps,
      nal: Array[Byte], nalType: Int): Option[(Int, Int, Array[Byte])] = {
    if (pps.cabac || !sps.frameMbsOnly || sps.separateColourPlane) return None
    try {
      val r = new BitReader(rbspOf(nal, 1, nal.length))
      val firstMb = r.ue()
      if (firstMb != 0) return None // one slice per frame only
      val sliceType = r.ue()
      if (sliceType != 2 && sliceType != 7) return None // I slices only
      r.ue() // pic_parameter_set_id
      r.u(sps.log2MaxFrameNum) // frame_num
      if (nalType == 5) r.ue() // idr_pic_id
      if (sps.pocType == 0) {
        r.u(sps.log2MaxPocLsb)
        if (pps.bottomFieldPocPresent) r.se()
      } else if (sps.pocType == 1) return None // unsupported in this path
      if (pps.redundantPresent) r.ue()
      // I slice: no ref-pic-list syntax. dec_ref_pic_marking is present
      // ONLY for reference pictures (nal_ref_idc != 0, §7.3.3) — parsing
      // it unconditionally phase-shifts a non-reference I slice.
      val refIdc = (nal(0) >> 5) & 3
      if (nalType == 5) { r.u1(); r.u1() }
      else if (refIdc != 0 && r.u1() == 1)
        return None // adaptive marking unsupported
      var qpY = pps.picInitQp + r.se() // slice_qp_delta
      if (qpY < 0 || qpY > 51) return None
      if (pps.deblockingPresent) {
        val idc = r.ue()
        if (idc != 1) { r.se(); r.se() }
      }
      // slice data: raster-scan macroblocks, CAVLC entropy (cabac==false)
      val wMbs = sps.widthMbs
      val hMbs = sps.heightMbs
      val wPix = wMbs * 16
      val luma = new Array[Byte](wPix * hMbs * 16)
      // per-4x4-block TotalCoeff for nC prediction (-1 = unavailable)
      val lumaNc = Array.fill(hMbs * 4 * wMbs * 4)(-1)
      val chromaNc = Array.fill(2)(Array.fill(hMbs * 2 * wMbs * 2)(-1))
      // per-4x4-block Intra4x4PredMode for most-probable-mode prediction
      // (§8.3.1.1): MinValue = not decoded (unavailable), -1 = decoded
      // but not Intra_4x4 (contributes DC = 2), >= 0 = the actual mode
      val predModes = Array.fill(hMbs * 4 * wMbs * 4)(Int.MinValue)
      val bStride = wMbs * 4
      // §8.3.1.2 decode-order index of a 4x4 block (MB raster, Z within)
      def blkOrd(gx: Int, gy: Int): Int = {
        val blk = ((gy & 3) >> 1) * 8 + ((gx & 3) >> 1) * 4 +
          ((gy & 3) & 1) * 2 + ((gx & 3) & 1)
        ((gy >> 2) * wMbs + (gx >> 2)) * 16 + blk
      }
      val nMbs = wMbs * hMbs
      var mb = 0
      while (mb < nMbs) {
        val mbCol = mb % wMbs
        val mbRow = mb / wMbs
        val mbX = mbCol * 16
        val mbY = mbRow * 16
        val mbType = r.ue()
        if (mbType == 25) {
          // ---- I_PCM: raw samples (§7.3.5, Table 7-11 mb_type 25)
          r.byteAlign() // pcm_alignment_zero_bit(s)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              luma((mbY + y) * wPix + mbX + x) = r.alignedByte().toByte
              x += 1
            }
            y += 1
          }
          // chroma samples (4:2:0 ⇒ 2 × 8×8; 4:2:2 ⇒ 2 × 8×16; none for
          // monochrome) — read and discard, features are luminance-only
          val chromaSamples = sps.chromaArrayType match {
            case 0 => 0
            case 1 => 2 * 64
            case 2 => 2 * 128
            case _ => 2 * 256
          }
          var c = 0
          while (c < chromaSamples) { r.alignedByte(); c += 1 }
          // nC bookkeeping: I_PCM neighbors count 16 (§9.2.1); mode
          // prediction sees a decoded non-I4x4 block (contributes DC)
          var by = 0
          while (by < 4) { var bx = 0
            while (bx < 4) {
              lumaNc((mbRow * 4 + by) * wMbs * 4 + mbCol * 4 + bx) = 16
              predModes((mbRow * 4 + by) * bStride + mbCol * 4 + bx) = -1
              bx += 1 }
            by += 1 }
          var cc = 0
          while (cc < 2) { var cb = 0
            while (cb < 4) {
              chromaNc(cc)((mbRow * 2 + (cb >> 1)) * wMbs * 2 +
                mbCol * 2 + (cb & 1)) = 16
              cb += 1 }
            cc += 1 }
        } else if (mbType >= 1 && mbType <= 24) {
          // ---- Intra_16x16 (Table 7-11): mb_type−1 packs the prediction
          // mode, CodedBlockPatternChroma, and CodedBlockPatternLuma
          if (sps.chromaArrayType != 1)
            return None // CAVLC chroma-residual parse is 4:2:0-only here
          val m = mbType - 1
          val predMode = m % 4
          val cbpChroma = (m / 4) % 3
          val acCoded = m >= 12 // CodedBlockPatternLuma 15 vs 0
          if (r.ue() > 3) return None // intra_chroma_pred_mode
          qpY = (qpY + r.se() + 52) % 52 // mb_qp_delta (always present)
          // luma DC block: nC as for luma4x4BlkIdx 0 (§9.2.1); its
          // TotalCoeff does NOT enter the nC grid (AC totals do)
          val dcNc = ncOf(lumaNc, wMbs * 4, mbCol * 4, mbRow * 4)
          val dcBlk = Cavlc.readBlock(r, dcNc, 16)
          val dcC = new Array[Int](16)
          var k = 0
          while (k < 16) { dcC(ZigZag4x4(k)) = dcBlk.levels(k); k += 1 }
          val dc = inverseHadamard4(dcC).map(scaleDc(_, qpY))
          val pred = predict16x16(predMode, luma, wPix, mbX, mbY,
            mbCol > 0, mbRow > 0).getOrElse(return None)
          var blk = 0
          while (blk < 16) {
            // luma4x4BlkIdx Z-order → spatial 4x4-block coords (§6.4.3)
            val bx = ((blk >> 2) & 1) * 2 + (blk & 1)
            val by = ((blk >> 2) >> 1) * 2 + ((blk >> 1) & 1)
            val gx = mbCol * 4 + bx
            val gy = mbRow * 4 + by
            predModes(gy * bStride + gx) = -1 // decoded, not Intra_4x4
            val d = new Array[Int](16)
            if (acCoded) {
              val nc = ncOf(lumaNc, wMbs * 4, gx, gy)
              val acBlk = Cavlc.readBlock(r, nc, 15)
              lumaNc(gy * wMbs * 4 + gx) = acBlk.totalCoeff
              var kk = 1
              while (kk < 16) {
                val lev = acBlk.levels(kk - 1)
                if (lev != 0) {
                  val pos = ZigZag4x4(kk)
                  d(pos) = scaleAc(lev, qpY, pos / 4, pos % 4)
                }
                kk += 1
              }
            } else lumaNc(gy * wMbs * 4 + gx) = 0
            d(0) = dc(by * 4 + bx)
            val res = inverseTransform4x4(d)
            var yy = 0
            while (yy < 4) {
              var xx = 0
              while (xx < 4) {
                val px = bx * 4 + xx
                val py = by * 4 + yy
                luma((mbY + py) * wPix + mbX + px) =
                  clip1(pred(py * 16 + px) + res(yy * 4 + xx)).toByte
                xx += 1
              }
              yy += 1
            }
            blk += 1
          }
          // chroma residual (§7.3.5.3.3): parsed to stay bit-synced —
          // features are luminance-only, so values are discarded but the
          // nC grid must track TotalCoeff for later macroblocks
          if (cbpChroma > 0) {
            var c = 0
            while (c < 2) { Cavlc.readBlock(r, -1, 4); c += 1 } // chroma DC
          }
          var c = 0
          while (c < 2) {
            var cb = 0
            while (cb < 4) {
              val cgx = mbCol * 2 + (cb & 1)
              val cgy = mbRow * 2 + (cb >> 1)
              chromaNc(c)(cgy * wMbs * 2 + cgx) =
                if (cbpChroma == 2) {
                  val nc = ncOf(chromaNc(c), wMbs * 2, cgx, cgy)
                  Cavlc.readBlock(r, nc, 15).totalCoeff
                } else 0
              cb += 1
            }
            c += 1
          }
        } else if (mbType == 0) {
          // ---- I_NxN = Intra_4x4 (Table 7-11 mb_type 0, CAVLC):
          // per-block §8.3.1 mode prediction, §8.3.1.2 nine-mode
          // prediction with decode-order top-right availability, Table
          // 9-4 mapped-Exp-Golomb CBP, per-8x8-gated 16-coeff residuals
          if (sps.chromaArrayType != 1)
            return None // CAVLC chroma-residual parse is 4:2:0-only here
          // 1. the 16 prediction modes (parsed BEFORE everything else)
          val modes = new Array[Int](16)
          var blk = 0
          while (blk < 16) {
            val bx = ((blk >> 2) & 1) * 2 + (blk & 1)
            val by = ((blk >> 2) >> 1) * 2 + ((blk >> 1) & 1)
            val gx = mbCol * 4 + bx
            val gy = mbRow * 4 + by
            // most probable mode (§8.3.1.1): DC if either neighbor is
            // unavailable; else min, with non-I4x4 neighbors reading DC
            def contrib(v: Int): Int = if (v < 0) 2 else v
            val a = if (gx > 0) predModes(gy * bStride + gx - 1)
                    else Int.MinValue
            val b = if (gy > 0) predModes((gy - 1) * bStride + gx)
                    else Int.MinValue
            val predicted =
              if (a == Int.MinValue || b == Int.MinValue) 2
              else math.min(contrib(a), contrib(b))
            modes(blk) =
              if (r.u1() == 1) predicted // prev_intra4x4_pred_mode_flag
              else {
                val rem = r.u(3)
                if (rem < predicted) rem else rem + 1
              }
            predModes(gy * bStride + gx) = modes(blk)
            blk += 1
          }
          if (r.ue() > 3) return None // intra_chroma_pred_mode
          // 2. CBP (mapped-Exp-Golomb, Table 9-4 intra column)
          val cbpCode = r.ue()
          if (cbpCode >= CbpIntra.length) return None
          val cbp = CbpIntra(cbpCode)
          val cbpLuma = cbp & 15
          val cbpChroma = cbp >> 4
          if (cbp != 0) qpY = (qpY + r.se() + 52) % 52 // mb_qp_delta
          // 3. per-block residual parse + immediate reconstruction —
          // within-MB prediction reads the just-reconstructed neighbors
          blk = 0
          while (blk < 16) {
            val bx = ((blk >> 2) & 1) * 2 + (blk & 1)
            val by = ((blk >> 2) >> 1) * 2 + ((blk >> 1) & 1)
            val gx = mbCol * 4 + bx
            val gy = mbRow * 4 + by
            val d = new Array[Int](16)
            if ((cbpLuma & (1 << (blk >> 2))) != 0) {
              val nc = ncOf(lumaNc, wMbs * 4, gx, gy)
              val rb = Cavlc.readBlock(r, nc, 16)
              lumaNc(gy * wMbs * 4 + gx) = rb.totalCoeff
              var kk = 0
              while (kk < 16) {
                val lev = rb.levels(kk)
                if (lev != 0) {
                  val pos = ZigZag4x4(kk)
                  d(pos) = scaleAc(lev, qpY, pos / 4, pos % 4)
                }
                kk += 1
              }
            } else lumaNc(gy * wMbs * 4 + gx) = 0
            val x0 = mbX + bx * 4
            val y0 = mbY + by * 4
            val trAvail = gx + 1 < wMbs * 4 && gy > 0 &&
              blkOrd(gx + 1, gy - 1) < blkOrd(gx, gy)
            val pred = predict4x4(modes(blk), luma, wPix, x0, y0,
              gx > 0, gy > 0, trAvail).getOrElse(return None)
            val res = inverseTransform4x4(d)
            var yy = 0
            while (yy < 4) {
              var xx = 0
              while (xx < 4) {
                luma((y0 + yy) * wPix + x0 + xx) =
                  clip1(pred(yy * 4 + xx) + res(yy * 4 + xx)).toByte
                xx += 1
              }
              yy += 1
            }
            blk += 1
          }
          // 4. chroma residual parse (same §7.3.5.3.3 order as I_16x16)
          if (cbpChroma > 0) {
            var c = 0
            while (c < 2) { Cavlc.readBlock(r, -1, 4); c += 1 }
          }
          var c = 0
          while (c < 2) {
            var cb = 0
            while (cb < 4) {
              val cgx = mbCol * 2 + (cb & 1)
              val cgy = mbRow * 2 + (cb >> 1)
              chromaNc(c)(cgy * wMbs * 2 + cgx) =
                if (cbpChroma == 2) {
                  val nc = ncOf(chromaNc(c), wMbs * 2, cgx, cgy)
                  Cavlc.readBlock(r, nc, 15).totalCoeff
                } else 0
              cb += 1
            }
            c += 1
          }
        } else
          return None // out-of-range mb_type for an I slice
        mb += 1
      }
      // apply frame cropping in the SPS's own crop units (§7.4.2.1.1)
      val (w, h) = (sps.width, sps.height)
      if (w <= 0 || h <= 0) return None
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(luma,
          (y + sps.cropUnitY * sps.cropT) * wPix + sps.cropUnitX * sps.cropL,
          out, y * w, w)
        y += 1
      }
      Some((w, h, out))
    } catch { case _: Exception => None }
  }

  // ---- MP4 demux ----------------------------------------------------------

  private final case class Track(avcC: (Array[Byte], Array[Byte], Int),
                                 sampleOffsets: Array[Long],
                                 sampleSizes: Array[Long])

  /** Video track demux: (first SPS, first PPS, NAL length-prefix size)
    * from `stsd/avc1/avcC`, plus per-sample file offsets/sizes from the
    * stsc/stsz/stco(co64) chunk mapping.
    */
  private def videoTrack(p: Array[Byte]): Option[Track] = {
    val top = Multimodal.boxChildren(p, 0, p.length)
    if (!top.exists(_._1 == "ftyp")) return None
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    for (trak <- Multimodal.boxChildren(p, moov._2, moov._3)
           if trak._1 == "trak") {
      val mdia = Multimodal.boxChildren(p, trak._2, trak._3)
        .find(_._1 == "mdia").getOrElse(return None)
      val mc = Multimodal.boxChildren(p, mdia._2, mdia._3)
      val isVideo = mc.find(_._1 == "hdlr").exists { h =>
        h._3 - h._2 >= 12 && new String(p, h._2 + 8, 4,
          java.nio.charset.StandardCharsets.ISO_8859_1) == "vide"
      }
      if (isVideo) {
        val sc = mc.find(_._1 == "minf")
          .flatMap(m => Multimodal.boxChildren(p, m._2, m._3).find(_._1 == "stbl"))
          .map(s => Multimodal.boxChildren(p, s._2, s._3))
          .getOrElse(return None)
        // stsd → avc1 → avcC (sample entry header is 78 bytes)
        val avcC = sc.find(_._1 == "stsd").flatMap { sd =>
          Multimodal.boxChildren(p, sd._2 + 8, sd._3)
            .find(e => e._1 == "avc1" || e._1 == "avc3")
            .flatMap(e => Multimodal.boxChildren(p, e._2 + 78, e._3)
              .find(_._1 == "avcC"))
            .flatMap(c => parseAvcC(p, c._2, c._3))
        }.getOrElse(return None)
        // sample sizes
        val stsz = sc.find(_._1 == "stsz").getOrElse(return None)
        val fixedSize = Multimodal.be32u(p, stsz._2 + 4)
        val nSamples = Multimodal.be32u(p, stsz._2 + 8).toInt
        if (nSamples <= 0 || nSamples > (1 << 22)) return None
        val sizes = Array.tabulate(nSamples)(i =>
          if (fixedSize != 0) fixedSize
          else Multimodal.be32u(p, stsz._2 + 12 + 4 * i))
        // chunk offsets
        val stco = sc.find(c => c._1 == "stco" || c._1 == "co64")
          .getOrElse(return None)
        val co64 = stco._1 == "co64"
        val nChunks = Multimodal.be32u(p, stco._2 + 4).toInt
        val chunkOff = Array.tabulate(nChunks)(i =>
          if (co64) Multimodal.be64(p, stco._2 + 8 + 8 * i)
          else Multimodal.be32u(p, stco._2 + 8 + 4 * i))
        // samples-per-chunk runs
        val stsc = sc.find(_._1 == "stsc").getOrElse(return None)
        val nRuns = Multimodal.be32u(p, stsc._2 + 4).toInt
        val runs = Array.tabulate(nRuns) { i =>
          val o = stsc._2 + 8 + 12 * i
          (Multimodal.be32u(p, o).toInt, Multimodal.be32u(p, o + 4).toInt)
        }
        // walk chunks, laying out per-sample offsets
        val offsets = new Array[Long](nSamples)
        var s = 0
        var chunk = 0
        while (s < nSamples && chunk < nChunks) {
          val perChunk = runs.reverse.find(_._1 <= chunk + 1)
            .map(_._2).getOrElse(return None)
          var off = chunkOff(chunk)
          var i = 0
          while (i < perChunk && s < nSamples) {
            offsets(s) = off
            off += sizes(s)
            s += 1
            i += 1
          }
          chunk += 1
        }
        if (s < nSamples) return None
        return Some(Track(avcC, offsets, sizes))
      }
    }
    None
  }

  /** avcC record → (first SPS NAL, first PPS NAL, length-prefix size). */
  private def parseAvcC(p: Array[Byte], s: Int,
                        e: Int): Option[(Array[Byte], Array[Byte], Int)] = {
    if (e - s < 7) return None
    val lenSize = (p(s + 4) & 0x03) + 1
    val nSps = p(s + 5) & 0x1F
    var off = s + 6
    var sps: Array[Byte] = null
    var i = 0
    while (i < nSps) {
      val l = ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)
      if (sps == null) sps = java.util.Arrays.copyOfRange(p, off + 2, off + 2 + l)
      off += 2 + l
      i += 1
    }
    val nPps = p(off) & 0xFF
    off += 1
    var pps: Array[Byte] = null
    i = 0
    while (i < nPps) {
      val l = ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)
      if (pps == null) pps = java.util.Arrays.copyOfRange(p, off + 2, off + 2 + l)
      off += 2 + l
      i += 1
    }
    if (sps == null || pps == null) None else Some((sps, pps, lenSize))
  }

  /** Parse the MP4 container ONCE and return a per-frame pixel decoder:
    * (frame count, idx → (width, height, luma)). The per-frame closure
    * re-derives nothing from the container — callers that decode many
    * frames of one payload (feature extraction over a whole video) pay
    * the box walk once instead of once per frame, which is the
    * difference between O(frames) and O(frames²) demux work on long
    * videos. Out-of-range or undecodable frames → None, as in
    * [[decodeFrame]].
    */
  def frameDecoder(payload: Array[Byte])
      : Option[(Int, Int => Option[(Int, Int, Array[Byte])])] = {
    if (payload == null || payload.length < 16) return None
    try {
      val tr = videoTrack(payload).getOrElse(return None)
      val (spsNal, ppsNal, lenSize) = tr.avcC
      val avccSps = parseSps(rbspOf(spsNal, 1, spsNal.length))
      val avccPps = parsePps(rbspOf(ppsNal, 1, ppsNal.length))
      val dec = (idx: Int) =>
        if (idx < 0 || idx >= tr.sampleOffsets.length) None
        else decodeSample(payload, tr, avccSps, avccPps, lenSize, idx)
      Some((tr.sampleOffsets.length, dec))
    } catch { case _: Exception => None }
  }

  /** Decode one sample given the already-parsed track. In-band SPS/PPS
    * NALs inside the sample override the avcC ones for this frame.
    */
  private def decodeSample(payload: Array[Byte], tr: Track,
                           avccSps: Sps, avccPps: Pps,
                           lenSize: Int, idx: Int): Option[(Int, Int, Array[Byte])] = {
    try {
      var sps = avccSps
      var pps = avccPps
      val s = tr.sampleOffsets(idx)
      val e = s + tr.sampleSizes(idx)
      if (s < 0 || e > payload.length) return None
      var off = s.toInt
      while (off + lenSize <= e) {
        var l = 0L
        var i = 0
        while (i < lenSize) { l = (l << 8) | (payload(off + i) & 0xFF); i += 1 }
        val ns = off + lenSize
        val ne = ns + l.toInt
        if (l <= 0 || ne > e) return None
        val nalType = payload(ns) & 0x1F
        val nal = java.util.Arrays.copyOfRange(payload, ns, ne)
        nalType match {
          case 7 => sps = parseSps(rbspOf(nal, 1, nal.length))
          case 8 => pps = parsePps(rbspOf(nal, 1, nal.length))
          case 5 | 1 =>
            return decodeISlice(sps, pps, nal, nalType)
          case _ => ()
        }
        off = ne
      }
      None
    } catch { case _: Exception => None }
  }

  /** Decode frame `idx` of an MP4 payload to (width, height, luma plane).
    * Real pixels for streams whose slices are I_PCM-coded; None (honest
    * degrade) for entropy-coded residuals — see the object doc. One-shot
    * form of [[frameDecoder]] (re-parses the container per call).
    */
  def decodeFrame(payload: Array[Byte],
                  idx: Int): Option[(Int, Int, Array[Byte])] = {
    if (idx < 0) return None
    frameDecoder(payload).flatMap(_._2(idx))
  }
}
