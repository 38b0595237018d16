package graft

/** In-memory H.264-in-MP4 fixture builder for the multimodal video specs:
  * a minimal ISO BMFF wrap around baseline-profile I_PCM-coded IDR
  * frames. I_PCM is raw-sample macroblock coding (ISO/IEC 14496-10
  * §7.3.5, mb_type 25) — trivially encodable, bit-layout checkable
  * against the spec by hand, and decodable by ANY conformant decoder, so
  * the fixture exercises the engine's real NAL/SPS/PPS/slice machinery
  * without an encoder dependency (the container ships none; zero egress).
  */
object VideoFixture {

  /** MSB-first bit writer with exp-Golomb. */
  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def u1(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val cw = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(cw)
      u(0, len - 1)
      u(cw, len)
    }
    def se(v: Int): Unit = ue(if (v <= 0) -2 * v else 2 * v - 1)
    def align0(): Unit = while (nBits != 0) u1(0)
    def rawByte(b: Int): Unit = { require(nBits == 0); buf += b.toByte }
    def stopBit(): Unit = { u1(1); align0() }
    def bytes: Array[Byte] = buf.toArray
  }

  /** RBSP → NAL payload: emulation-prevention escaping (§7.4.1.1). */
  private def escape(rbsp: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var zeros = 0
    for (b <- rbsp) {
      if (zeros >= 2 && (b & 0xFF) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toArray
  }

  private def nal(refIdcType: Int, rbsp: Array[Byte]): Array[Byte] =
    refIdcType.toByte +: escape(rbsp)

  /** Baseline SPS: 4:2:0, frame-MBs-only, no cropping, poc type 2. */
  def sps(widthMbs: Int, heightMbs: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(66, 8) // profile_idc: Baseline
    w.u(0, 8)  // constraint flags + reserved
    w.u(10, 8) // level_idc
    w.ue(0)    // seq_parameter_set_id
    w.ue(0)    // log2_max_frame_num_minus4
    w.ue(2)    // pic_order_cnt_type: 2 (no slice-header POC)
    w.ue(1)    // max_num_ref_frames
    w.u1(0)    // gaps_in_frame_num_value_allowed
    w.ue(widthMbs - 1)
    w.ue(heightMbs - 1)
    w.u1(1)    // frame_mbs_only_flag
    w.u1(1)    // direct_8x8_inference
    w.u1(0)    // frame_cropping_flag
    w.u1(0)    // vui_parameters_present
    w.stopBit()
    nal(0x67, w.bytes)
  }

  def pps(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.u1(0)          // entropy_coding_mode: CAVLC
    w.u1(0)          // bottom_field_pic_order_in_frame_present
    w.ue(0)          // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx_l0/l1_default_active_minus1
    w.u1(0)          // weighted_pred
    w.u(0, 2)        // weighted_bipred_idc
    w.se(0); w.se(0); w.se(0) // qp deltas / chroma offset
    w.u1(0)          // deblocking_filter_control_present
    w.u1(0)          // constrained_intra_pred
    w.u1(0)          // redundant_pic_cnt_present
    w.stopBit()
    nal(0x68, w.bytes)
  }

  /** IDR slice whose macroblocks are all I_PCM with per-MB constant luma
    * from `mbLuma` (raster order) and chroma 128.
    */
  def idrIPcmSlice(widthMbs: Int, heightMbs: Int,
                   mbLuma: Seq[Int]): Array[Byte] = {
    require(mbLuma.length == widthMbs * heightMbs)
    val w = new BitWriter
    w.ue(0)    // first_mb_in_slice
    w.ue(7)    // slice_type: I (all slices in pic)
    w.ue(0)    // pic_parameter_set_id
    w.u(0, 4)  // frame_num (log2_max_frame_num = 4)
    w.ue(0)    // idr_pic_id
    w.u1(0); w.u1(0) // dec_ref_pic_marking: no_output, long_term
    w.se(0)    // slice_qp_delta
    for (lum <- mbLuma) {
      w.ue(25) // mb_type: I_PCM
      w.align0() // pcm_alignment_zero_bit
      var i = 0
      while (i < 256) { w.rawByte(lum); i += 1 }
      i = 0
      while (i < 128) { w.rawByte(128); i += 1 } // 4:2:0 chroma, neutral
    }
    w.stopBit()
    nal(0x65, w.bytes)
  }

  /** High-profile SPS carrying an explicit `chroma_format_idc` (0 =
    * monochrome, 1 = 4:2:0, 2 = 4:2:2, 3 = 4:4:4) and frame cropping —
    * the §7.4.2.1.1 crop-unit probe: CropUnitX/Y depend on the chroma
    * format, not always the 4:2:0 ×2.
    */
  def spsHigh(widthMbs: Int, heightMbs: Int, chromaFormat: Int,
              cl: Int, cr: Int, ct: Int, cb: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(100, 8) // profile_idc: High — SPS carries chroma_format_idc
    w.u(0, 8)
    w.u(10, 8)
    w.ue(0)             // seq_parameter_set_id
    w.ue(chromaFormat)  // chroma_format_idc
    if (chromaFormat == 3) w.u1(0) // separate_colour_plane_flag
    w.ue(0); w.ue(0)    // bit_depth_luma/chroma_minus8
    w.u1(0)             // qpprime_y_zero_transform_bypass
    w.u1(0)             // seq_scaling_matrix_present
    w.ue(0)             // log2_max_frame_num_minus4
    w.ue(2)             // pic_order_cnt_type: 2
    w.ue(1)             // max_num_ref_frames
    w.u1(0)             // gaps_in_frame_num_value_allowed
    w.ue(widthMbs - 1)
    w.ue(heightMbs - 1)
    w.u1(1)             // frame_mbs_only_flag
    w.u1(1)             // direct_8x8_inference
    if ((cl | cr | ct | cb) != 0) {
      w.u1(1); w.ue(cl); w.ue(cr); w.ue(ct); w.ue(cb)
    } else w.u1(0)
    w.u1(0)             // vui_parameters_present
    w.stopBit()
    nal(0x67, w.bytes)
  }

  /** I_PCM slice with per-PIXEL luma from `luma(x, y)` (frame
    * coordinates), a configurable PCM chroma sample count per MB (0 for
    * monochrome, 128 for 4:2:0, 256 for 4:2:2, 512 for 4:4:4), and a
    * configurable NAL header — `idr = false, refIdc = 0` builds the
    * non-reference I slice whose header carries NO dec_ref_pic_marking
    * (§7.3.3: present only when nal_ref_idc != 0).
    */
  def iPcmSliceXY(widthMbs: Int, heightMbs: Int, luma: (Int, Int) => Int,
                  chromaSamplesPerMb: Int = 128, idr: Boolean = true,
                  refIdc: Int = 3): Array[Byte] = {
    val w = new BitWriter
    w.ue(0)    // first_mb_in_slice
    w.ue(7)    // slice_type: I (all slices in pic)
    w.ue(0)    // pic_parameter_set_id
    w.u(0, 4)  // frame_num
    if (idr) w.ue(0) // idr_pic_id
    // poc type 2: no POC syntax; redundant_pic_cnt absent
    if (idr) { w.u1(0); w.u1(0) }          // dec_ref_pic_marking (IDR form)
    else if (refIdc != 0) w.u1(0)          // adaptive_ref_pic_marking_mode
    w.se(0)    // slice_qp_delta
    for (mb <- 0 until widthMbs * heightMbs) {
      val mbX = (mb % widthMbs) * 16
      val mbY = (mb / widthMbs) * 16
      w.ue(25) // mb_type: I_PCM
      w.align0()
      for (y <- 0 until 16; x <- 0 until 16)
        w.rawByte(luma(mbX + x, mbY + y) & 0xFF)
      for (_ <- 0 until chromaSamplesPerMb) w.rawByte(128)
    }
    w.stopBit()
    nal(((refIdc & 3) << 5) | (if (idr) 5 else 1), w.bytes)
  }

  // ---- CAVLC intra encoder (test-side inverse of the engine decoder) -----

  sealed trait FixMb

  /** I_PCM filler macroblock: constant luma, neutral chroma. */
  final case class PcmMb(luma: Int) extends FixMb

  /** One Intra_16x16 macroblock of the CAVLC fixture.
    *
    * @param predMode  §8.3.3 mode (0 V, 1 H, 2 DC, 3 plane)
    * @param dcLevels  16 luma-DC levels in ZIGZAG order
    * @param acLevels  per 4x4 block (Z-order, 16 blocks) 15 AC levels in
    *                  zigzag order, or None for CodedBlockPatternLuma 0
    * @param qpDelta   mb_qp_delta
    * @param chromaCbp 0 none, 1 DC only, 2 DC+AC (fixed simple levels —
    *                  the decoder discards chroma values but must PARSE
    *                  them to stay bit-synced)
    */
  final case class I16Mb(predMode: Int, dcLevels: Array[Int],
                         acLevels: Option[Array[Array[Int]]] = None,
                         qpDelta: Int = 0, chromaCbp: Int = 0) extends FixMb

  /** One Intra_4x4 (I_NxN) macroblock of the CAVLC fixture.
    *
    * @param modes     16 §8.3.1.2 prediction modes (0..8), Z-order; must
    *                  be legal for the block's edge availability
    * @param cbpLuma   CodedBlockPatternLuma (bit per 8x8 quadrant)
    * @param levels    per 4x4 block (Z-order) 16 levels in zigzag order;
    *                  only blocks inside coded 8x8s are written
    * @param qpDelta   mb_qp_delta (only coded when cbp != 0)
    * @param chromaCbp as [[I16Mb]]
    */
  final case class I4Mb(modes: Array[Int], cbpLuma: Int,
                        levels: Array[Array[Int]],
                        qpDelta: Int = 0, chromaCbp: Int = 0) extends FixMb

  /** Inverse permutation of the decoder's Table 9-4 intra column:
    * coded_block_pattern → codeNum for the me(v) write.
    */
  private lazy val cbpIntraInv: Array[Int] = {
    val fwd = graft.multimodal.H264.CbpIntra
    val inv = new Array[Int](fwd.length)
    for (i <- fwd.indices) inv(fwd(i)) = i
    inv
  }

  /** Inverse of `Cavlc.readBlock` (§9.2): writes one residual block's
    * coeff_token, trailing-one signs, levels, total_zeros and run_before
    * codes. `levels` in scan order; returns TotalCoeff for the caller's
    * nC bookkeeping.
    */
  def writeCavlcBlock(w: BitWriter, levels: Array[Int], nC: Int): Int = {
    import graft.multimodal.Cavlc
    def emit(code: String): Unit = code.foreach(c => w.u1(if (c == '1') 1 else 0))
    val nz = levels.zipWithIndex.filter(_._1 != 0)
    val tc = nz.length
    var t1 = 0
    while (t1 < 3 && t1 < tc && math.abs(nz(tc - 1 - t1)._1) == 1) t1 += 1
    val tokenCode =
      if (nC >= 8) Cavlc.writeCoeffTokenFlc(t1, tc)
      else {
        val table = if (nC == -1) Cavlc.CoeffTokenChromaDc
                    else if (nC < 2) Cavlc.CoeffToken0
                    else if (nC < 4) Cavlc.CoeffToken1
                    else Cavlc.CoeffToken2
        table.bySymbol(Cavlc.token(t1, tc))
      }
    emit(tokenCode)
    if (tc == 0) return 0
    // levels, highest frequency first
    var suffixLength = if (tc > 10 && t1 < 3) 1 else 0
    var i = 0
    while (i < tc) {
      val level = nz(tc - 1 - i)._1
      if (i < t1) w.u1(if (level < 0) 1 else 0)
      else {
        var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
        if (i == t1 && t1 < 3) levelCode -= 2
        require(levelCode >= 0, s"level $level invalid after trailing ones")
        if (suffixLength == 0) {
          if (levelCode < 14) { w.u(0, levelCode); w.u1(1) }
          else if (levelCode < 30) { w.u(0, 14); w.u1(1); w.u(levelCode - 14, 4) }
          else {
            require(levelCode < 30 + 4096, "fixture level out of range")
            w.u(0, 15); w.u1(1); w.u(levelCode - 30, 12)
          }
        } else {
          val cap = 15 << suffixLength
          if (levelCode < cap) {
            w.u(0, levelCode >> suffixLength); w.u1(1)
            w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
          } else {
            require(levelCode < cap + 4096, "fixture level out of range")
            w.u(0, 15); w.u1(1); w.u(levelCode - cap, 12)
          }
        }
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }
    // total_zeros + run_before
    val maxNumCoeff = levels.length
    val totalZeros = nz.last._2 + 1 - tc
    if (tc < maxNumCoeff)
      emit((if (nC == -1) Cavlc.TotalZerosChromaDc(tc)
            else Cavlc.TotalZeros4x4(tc)).bySymbol(totalZeros))
    var zerosLeft = totalZeros
    i = tc - 1
    while (i >= 1 && zerosLeft > 0) {
      val run = nz(i)._2 - nz(i - 1)._2 - 1
      emit(Cavlc.RunBefore(math.min(zerosLeft, 7)).bySymbol(run))
      zerosLeft -= run
      i -= 1
    }
    tc
  }

  /** IDR slice of CAVLC intra macroblocks (I_16x16 / I_4x4 / I_PCM,
    * freely mixed): mirrors the decoder's nC and mode-prediction grids
    * so coeff_token table selection and prev_intra4x4_pred_mode
    * round-trip. Assumes the 4:2:0 baseline SPS of [[sps]].
    */
  def idrI16Slice(widthMbs: Int, heightMbs: Int,
                  mbs: Seq[FixMb],
                  sliceQpDelta: Int = 0): Array[Byte] = {
    require(mbs.length == widthMbs * heightMbs)
    val w = new BitWriter
    w.ue(0); w.ue(7); w.ue(0) // first_mb, slice_type I, pps id
    w.u(0, 4); w.ue(0)        // frame_num, idr_pic_id
    w.u1(0); w.u1(0)          // dec_ref_pic_marking
    w.se(sliceQpDelta)
    val lumaNc = Array.fill(heightMbs * 4 * widthMbs * 4)(-1)
    val chromaNc = Array.fill(2)(Array.fill(heightMbs * 2 * widthMbs * 2)(-1))
    // mirror of the decoder's Intra4x4PredMode grid (MinValue = not
    // decoded, -1 = decoded non-I4x4, >= 0 = mode)
    val predModes = Array.fill(heightMbs * 4 * widthMbs * 4)(Int.MinValue)
    val bStride = widthMbs * 4
    def ncOf(grid: Array[Int], stride: Int, gx: Int, gy: Int): Int = {
      val nA = if (gx > 0) grid(gy * stride + gx - 1) else -1
      val nB = if (gy > 0) grid((gy - 1) * stride + gx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA else if (nB >= 0) nB else 0
    }
    def blkXY(blk: Int): (Int, Int) =
      (((blk >> 2) & 1) * 2 + (blk & 1), ((blk >> 2) >> 1) * 2 + ((blk >> 1) & 1))
    def writeChroma(mbCol: Int, mbRow: Int, chromaCbp: Int): Unit = {
      if (chromaCbp > 0)
        for (c <- 0 until 2)
          writeCavlcBlock(w, Array(if (c == 0) 1 else -1, 0, 0, 0), -1)
      for (c <- 0 until 2; cb <- 0 until 4) {
        val cgx = mbCol * 2 + (cb & 1)
        val cgy = mbRow * 2 + (cb >> 1)
        chromaNc(c)(cgy * widthMbs * 2 + cgx) =
          if (chromaCbp == 2) {
            val lv = new Array[Int](15); lv(0) = 2; lv(3) = -1
            writeCavlcBlock(w, lv, ncOf(chromaNc(c), widthMbs * 2, cgx, cgy))
          } else 0
      }
    }
    for ((entry, mb) <- mbs.zipWithIndex) {
      val mbCol = mb % widthMbs
      val mbRow = mb / widthMbs
      entry match {
        case PcmMb(lum) =>
          w.ue(25); w.align0()
          for (_ <- 0 until 256) w.rawByte(lum)
          for (_ <- 0 until 128) w.rawByte(128)
          for (by <- 0 until 4; bx <- 0 until 4) {
            lumaNc((mbRow * 4 + by) * widthMbs * 4 + mbCol * 4 + bx) = 16
            predModes((mbRow * 4 + by) * bStride + mbCol * 4 + bx) = -1
          }
          for (c <- 0 until 2; cb <- 0 until 4)
            chromaNc(c)((mbRow * 2 + (cb >> 1)) * widthMbs * 2 +
              mbCol * 2 + (cb & 1)) = 16
        case m: I16Mb =>
          val acCoded = m.acLevels.nonEmpty
          w.ue(1 + m.predMode + 4 * m.chromaCbp + (if (acCoded) 12 else 0))
          w.ue(0) // intra_chroma_pred_mode
          w.se(m.qpDelta)
          writeCavlcBlock(w, m.dcLevels,
            ncOf(lumaNc, widthMbs * 4, mbCol * 4, mbRow * 4))
          for (blk <- 0 until 16) {
            val (bx, by) = blkXY(blk)
            val gx = mbCol * 4 + bx
            val gy = mbRow * 4 + by
            predModes(gy * bStride + gx) = -1
            lumaNc(gy * widthMbs * 4 + gx) =
              if (acCoded)
                writeCavlcBlock(w, m.acLevels.get(blk),
                  ncOf(lumaNc, widthMbs * 4, gx, gy))
              else 0
          }
          writeChroma(mbCol, mbRow, m.chromaCbp)
        case m: I4Mb =>
          w.ue(0) // mb_type I_NxN
          // 16 prediction modes, mirroring the decoder's §8.3.1.1 rule
          for (blk <- 0 until 16) {
            val (bx, by) = blkXY(blk)
            val gx = mbCol * 4 + bx
            val gy = mbRow * 4 + by
            def contrib(v: Int): Int = if (v < 0) 2 else v
            val a = if (gx > 0) predModes(gy * bStride + gx - 1)
                    else Int.MinValue
            val b = if (gy > 0) predModes((gy - 1) * bStride + gx)
                    else Int.MinValue
            val predicted =
              if (a == Int.MinValue || b == Int.MinValue) 2
              else math.min(contrib(a), contrib(b))
            val mode = m.modes(blk)
            if (mode == predicted) w.u1(1)
            else {
              w.u1(0)
              w.u(if (mode < predicted) mode else mode - 1, 3)
            }
            predModes(gy * bStride + gx) = mode
          }
          w.ue(0) // intra_chroma_pred_mode
          val cbp = m.cbpLuma | (m.chromaCbp << 4)
          w.ue(cbpIntraInv(cbp))
          if (cbp != 0) w.se(m.qpDelta)
          for (blk <- 0 until 16) {
            val (bx, by) = blkXY(blk)
            val gx = mbCol * 4 + bx
            val gy = mbRow * 4 + by
            lumaNc(gy * widthMbs * 4 + gx) =
              if ((m.cbpLuma & (1 << (blk >> 2))) != 0)
                writeCavlcBlock(w, m.levels(blk),
                  ncOf(lumaNc, widthMbs * 4, gx, gy))
              else 0
          }
          writeChroma(mbCol, mbRow, m.chromaCbp)
      }
    }
    w.stopBit()
    nal(0x65, w.bytes)
  }

  /** A MALFORMED IDR slice: an I_4x4 mb_type whose mode bits select
    * vertical prediction with no top row available, then filler — the
    * corrupt-stream honest-degrade probe (parse fails, never wrong
    * pixels). Since round 13 the I_4x4 layer itself decodes, so the
    * unsupported-coding probe is [[ppsCabac]] instead.
    */
  def idrEntropySlice(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(7); w.ue(0)
    w.u(0, 4); w.ue(0)
    w.u1(0); w.u1(0)
    w.se(0)
    w.ue(0)      // mb_type: I_4x4
    w.u(0, 24)   // mode bits decoding to an edge-invalid mode + filler
    w.stopBit()
    nal(0x65, w.bytes)
  }

  /** PPS with entropy_coding_mode = CABAC — the genuinely-unsupported
    * coding probe (the engine decodes the CAVLC intra layer only).
    */
  def ppsCabac(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(0) // pps id, sps id
    w.u1(1)          // entropy_coding_mode: CABAC
    w.u1(0)
    w.ue(0)
    w.ue(0); w.ue(0)
    w.u1(0)
    w.u(0, 2)
    w.se(0); w.se(0); w.se(0)
    w.u1(0)
    w.u1(0)
    w.u1(0)
    w.stopBit()
    nal(0x68, w.bytes)
  }

  // ---- ISO BMFF wrap ------------------------------------------------------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(body.length + 8) ++ tpe.getBytes("ISO-8859-1") ++ body
  }

  private def avcC(spsNal: Array[Byte], ppsNal: Array[Byte]): Array[Byte] =
    box("avcC",
      Array[Byte](1, 66, 0, 10, (0xFC | 3).toByte, (0xE0 | 1).toByte),
      be16(spsNal.length), spsNal,
      Array[Byte](1), be16(ppsNal.length), ppsNal)

  private def avc1(w: Int, h: Int, spsNal: Array[Byte],
                   ppsNal: Array[Byte]): Array[Byte] =
    box("avc1",
      new Array[Byte](6), be16(1),            // reserved + data_ref_index
      new Array[Byte](16),                    // pre_defined/reserved
      be16(w), be16(h),
      be32(0x00480000L), be32(0x00480000L),   // 72 dpi
      be32(0), be16(1),                       // reserved + frame_count
      new Array[Byte](32),                    // compressorname
      be16(24), be16(0xFFFF),                 // depth, pre_defined
      avcC(spsNal, ppsNal))

  /** Wrap per-frame samples (each = one length-prefixed slice NAL) into a
    * minimal MP4: 1 sample per chunk, `frameDurMs` per frame, timescale
    * 1000. SPS/PPS travel in avcC.
    */
  def mp4(widthPx: Int, heightPx: Int, spsNal: Array[Byte],
          ppsNal: Array[Byte], slices: Seq[Array[Byte]],
          frameDurMs: Int = 1000): Array[Byte] = {
    val samples = slices.map(s => be32(s.length) ++ s)
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(0),
      "isomavc1".getBytes("ISO-8859-1"))
    val mdatBody = samples.flatten.toArray
    val mdat = box("mdat", mdatBody)
    // absolute sample offsets inside the final file (mdat follows ftyp)
    val offsets = samples.scanLeft(ftyp.length + 8L)((o, s) => o + s.length)
    val n = samples.length
    val dur = n.toLong * frameDurMs
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(dur),
      be16(0x55C4), be16(0))
    val hdlr = box("hdlr", be32(0), be32(0),
      "vide".getBytes("ISO-8859-1"), new Array[Byte](12), Array[Byte](0))
    val stsd = box("stsd", be32(0), be32(1),
      avc1(widthPx, heightPx, spsNal, ppsNal))
    val stts = box("stts", be32(0), be32(1), be32(n), be32(frameDurMs))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    val stsz = box("stsz", be32(0), be32(0), be32(n),
      samples.flatMap(s => be32(s.length)).toArray)
    val stco = box("stco", be32(0), be32(n),
      offsets.take(n).flatMap(be32).toArray)
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    ftyp ++ mdat ++ moov
  }

  /** The standard 2-frame 32×16 fixture: frame 0 = dark-left/bright-right
    * MBs (40 | 200), frame 1 inverted.
    */
  def twoFrame32x16(): Array[Byte] = {
    val s = sps(2, 1)
    val p = pps()
    mp4(32, 16, s, p, Seq(
      idrIPcmSlice(2, 1, Seq(40, 200)),
      idrIPcmSlice(2, 1, Seq(200, 40))))
  }
}
