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

  /** An IDR slice that is NOT I_PCM (mb_type 0 = I_4x4 with entropy-coded
    * residual bits the engine does not reconstruct) — the honest-degrade
    * probe.
    */
  def idrEntropySlice(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0); w.ue(7); w.ue(0)
    w.u(0, 4); w.ue(0)
    w.u1(0); w.u1(0)
    w.se(0)
    w.ue(0)      // mb_type: I_4x4 — entropy-coded path
    w.u(0, 24)   // residual-ish filler bits
    w.stopBit()
    nal(0x65, w.bytes)
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
