package graft.multimodal

/** Pure-JVM H.264 (ISO/IEC 14496-10) I-frame PIXEL decode for MP4
  * payloads — the real-decode upgrade of the container-metadata-only MP4
  * path (reference behavior: `core/media/video_features.py` samples
  * frames through a native decoder; SURVEY.md §2.7 multimodal row).
  *
  * Honest scope, stated in the schema rather than faked: the decoder
  * implements the bitstream layers in full — MP4 sample demux (stsd/avcC
  * + stsc/stsz/stco chunk-offset mapping), NAL length-prefix framing,
  * RBSP emulation-prevention unescape, exp-Golomb SPS/PPS/slice-header
  * parsing — and PIXEL reconstruction for I_PCM macroblocks (raw-sample
  * coding, a mandatory baseline-profile coding mode every conformant
  * encoder/decoder supports). Entropy-coded residual macroblocks (CAVLC/
  * CABAC intra prediction) are NOT reconstructed: a slice containing them
  * returns None and the row degrades to `decoded=false` exactly as
  * before. This boundary is a documented property of [[decodeFrame]],
  * not a silent wrong answer — features are only ever emitted from real
  * pixels.
  *
  * Everything here is from the public spec: NAL syntax (§7.3.1), SPS
  * (§7.3.2.1), PPS (§7.3.2.2), slice header (§7.3.3), macroblock layer
  * with `mb_type` 25 = I_PCM (§7.3.5, Table 7-11), and the ISO BMFF
  * sample-table boxes (ISO/IEC 14496-12 §8.5–8.7).
  */
object H264 {

  // ---- RBSP bit reader -------------------------------------------------

  /** MSB-first bit reader over an RBSP (already emulation-unescaped). */
  private final class BitReader(b: Array[Byte]) {
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
    def width: Int = widthMbs * 16 - 2 * (cropL + cropR)
    def height: Int = heightMbs * 16 - 2 * (cropT + cropB)
  }

  private[multimodal] final case class Pps(
      spsId: Int, cabac: Boolean, bottomFieldPocPresent: Boolean,
      deblockingPresent: Boolean, redundantPresent: Boolean)

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
    r.se() // pic_init_qp_minus26
    r.se() // pic_init_qs_minus26
    r.se() // chroma_qp_index_offset
    val deblocking = r.u1() == 1
    r.u1() // constrained_intra_pred
    val redundant = r.u1() == 1
    Pps(spsId, cabac, bottomPoc, deblocking, redundant)
  }

  // ---- slice decode (I_PCM macroblocks) ----------------------------------

  /** Decode an IDR/I slice whose macroblocks are all I_PCM into the luma
    * plane (cropped). None for any entropy-coded macroblock, field
    * coding, or multi-slice-group stream — the honest-degrade boundary.
    */
  private[multimodal] def decodeIPcmSlice(sps: Sps, pps: Pps,
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
      // I slice: no ref-pic-list syntax. dec_ref_pic_marking:
      if (nalType == 5) { r.u1(); r.u1() }
      else if (r.u1() == 1) return None // adaptive marking unsupported
      r.se() // slice_qp_delta
      if (pps.deblockingPresent) {
        val idc = r.ue()
        if (idc != 1) { r.se(); r.se() }
      }
      // slice data: raster-scan macroblocks, CAVLC entropy (cabac==false)
      val wPix = sps.widthMbs * 16
      val luma = new Array[Byte](wPix * sps.heightMbs * 16)
      val nMbs = sps.widthMbs * sps.heightMbs
      var mb = 0
      while (mb < nMbs) {
        val mbType = r.ue()
        if (mbType != 25) return None // only I_PCM carries raw pixels
        r.byteAlign() // pcm_alignment_zero_bit(s)
        val mbX = (mb % sps.widthMbs) * 16
        val mbY = (mb / sps.widthMbs) * 16
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
        mb += 1
      }
      // apply frame cropping (4:2:0 crop units: 2 px per unit)
      val (w, h) = (sps.width, sps.height)
      if (w <= 0 || h <= 0) return None
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(luma, (y + 2 * sps.cropT) * wPix + 2 * sps.cropL,
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

  /** Decode frame `idx` of an MP4 payload to (width, height, luma plane).
    * Real pixels for streams whose slices are I_PCM-coded; None (honest
    * degrade) for entropy-coded residuals — see the object doc.
    */
  def decodeFrame(payload: Array[Byte],
                  idx: Int): Option[(Int, Int, Array[Byte])] = {
    if (payload == null || payload.length < 16 || idx < 0) return None
    try {
      val tr = videoTrack(payload).getOrElse(return None)
      if (idx >= tr.sampleOffsets.length) return None
      val (spsNal, ppsNal, lenSize) = tr.avcC
      var sps = parseSps(rbspOf(spsNal, 1, spsNal.length))
      var pps = parsePps(rbspOf(ppsNal, 1, ppsNal.length))
      val s = tr.sampleOffsets(idx)
      val e = s + tr.sampleSizes(idx)
      if (s < 0 || e > payload.length) return None
      // walk length-prefixed NALs in the sample; in-band SPS/PPS override
      // the avcC ones, the slice NAL decodes
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
            return decodeIPcmSlice(sps, pps, nal, nalType)
          case _ => ()
        }
        off = ne
      }
      None
    } catch { case _: Exception => None }
  }
}
