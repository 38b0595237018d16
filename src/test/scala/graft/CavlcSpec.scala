package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Cavlc, H264}

/** CAVLC + Intra_16x16 decode laws. The container ships no independent
  * H.264 encoder, so the suite pins everything pinnable without one:
  * structural table laws (prefix-free, complete, ≤16 bit), per-codeword
  * round-trips, the PUBLISHED textbook worked example of a CAVLC block
  * decode (an external golden vector: TotalCoeff 5, T1s 3, total_zeros 3,
  * 24-bit stream), and full-frame reconstruction pinned against an
  * INDEPENDENT second transcription of the spec math (2-D matrix loops
  * here vs the engine's flat-array butterflies).
  */
class CavlcSpec extends AnyFunSuite {

  private def reader(bits: String): H264.BitReader = {
    val padded = bits + "1" + "0" * ((8 - (bits.length + 1) % 8) % 8)
    new H264.BitReader(
      padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray)
  }

  private def lumaVlcs = Seq(
    "coeff_token nC<2" -> Cavlc.CoeffToken0,
    "coeff_token 2<=nC<4" -> Cavlc.CoeffToken1,
    "coeff_token 4<=nC<8" -> Cavlc.CoeffToken2)

  private def allVlcs: Seq[(String, Cavlc.Vlc)] =
    lumaVlcs ++ Seq("coeff_token chromaDC" -> Cavlc.CoeffTokenChromaDc) ++
      (1 to 15).map(i => s"total_zeros[$i]" -> Cavlc.TotalZeros4x4(i)) ++
      (1 to 3).map(i => s"total_zeros_cdc[$i]" -> Cavlc.TotalZerosChromaDc(i)) ++
      (1 to 7).map(i => s"run_before[$i]" -> Cavlc.RunBefore(i))

  test("every VLC table is prefix-free, complete, and <= 16 bits") {
    for ((name, vlc) <- allVlcs) {
      val codes = vlc.byCode.keys.toSeq
      assert(codes.forall(_.length <= 16), s"$name has an over-long code")
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$name: '$a' is a prefix of '$b'")
    }
    // completeness: coeff_token tables carry every legal (T1, TC) pair
    for ((name, vlc) <- lumaVlcs) {
      val want = (for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc))
        yield Cavlc.token(t1, tc)).toSet
      assert(vlc.bySymbol.keySet == want, s"$name incomplete")
    }
    assert(Cavlc.CoeffTokenChromaDc.bySymbol.keySet ==
      (for (tc <- 0 to 4; t1 <- 0 to math.min(3, tc))
        yield Cavlc.token(t1, tc)).toSet)
    // total_zeros[tc] codes totalZeros 0..16-tc; run_before[zl<=6] codes
    // runs 0..zl; the >6 table extends to run 14
    for (tc <- 1 to 15)
      assert(Cavlc.TotalZeros4x4(tc).bySymbol.keySet == (0 to 16 - tc).toSet,
        s"total_zeros[$tc]")
    for (tc <- 1 to 3)
      assert(Cavlc.TotalZerosChromaDc(tc).bySymbol.keySet == (0 to 4 - tc).toSet)
    for (zl <- 1 to 6)
      assert(Cavlc.RunBefore(zl).bySymbol.keySet == (0 to zl).toSet)
    assert(Cavlc.RunBefore(7).bySymbol.keySet == (0 to 14).toSet)
  }

  test("every codeword round-trips through the bit reader") {
    for ((name, vlc) <- allVlcs; (sym, code) <- vlc.bySymbol)
      assert(vlc.read(reader(code)) == sym, s"$name symbol $sym")
    // the nC >= 8 fixed-length form round-trips every legal pair
    for (tc <- 0 to 16; t1 <- 0 to math.min(3, tc)
         if tc > 0 || t1 == 0) {
      val r = reader(Cavlc.writeCoeffTokenFlc(t1, tc))
      assert(Cavlc.readCoeffTokenFlc(r) == Cavlc.token(t1, tc))
    }
  }

  test("published CAVLC worked example decodes bit-exactly") {
    // The standard textbook vector (Richardson, 'H.264 and MPEG-4 Video
    // Compression', CAVLC example): 4x4 block with zigzag coefficients
    // 0,3,0,1,-1,-1,0,1,0... -> TotalCoeff 5, TrailingOnes 3,
    // total_zeros 3, encoded (nC = 0) as the 24-bit stream below.
    val blk = Cavlc.readBlock(reader("000010001110010111101101"), 0, 16)
    assert(blk.totalCoeff == 5)
    assert(blk.levels.toSeq ==
      Seq(0, 3, 0, 1, -1, -1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0))
  }

  // ---- independent reconstruction (second transcription of §8.3.3/§8.5) --

  private object Ref {
    val zig = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
    private val na = Array(
      Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
      Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))
    def ls(m: Int, i: Int, j: Int): Int = {
      val c = if (i % 2 == 0 && j % 2 == 0) 0
              else if (i % 2 == 1 && j % 2 == 1) 1 else 2
      16 * na(m)(c)
    }
    def clip(v: Int): Int = math.max(0, math.min(255, v))

    def hadamard(c: Array[Array[Int]]): Array[Array[Int]] = {
      val h = Array(Array(1, 1, 1, 1), Array(1, 1, -1, -1),
        Array(1, -1, -1, 1), Array(1, -1, 1, -1))
      val t = Array.ofDim[Int](4, 4)
      for (i <- 0 until 4; j <- 0 until 4)
        t(i)(j) = (0 until 4).map(k => h(i)(k) * c(k)(j)).sum
      val f = Array.ofDim[Int](4, 4)
      for (i <- 0 until 4; j <- 0 until 4)
        f(i)(j) = (0 until 4).map(k => t(i)(k) * h(k)(j)).sum
      f
    }

    def dcOut(f: Int, qp: Int): Int =
      if (qp >= 36) (f * ls(qp % 6, 0, 0)) << (qp / 6 - 6)
      else (f * ls(qp % 6, 0, 0) + (1 << (5 - qp / 6))) >> (6 - qp / 6)

    def acOut(c: Int, qp: Int, i: Int, j: Int): Int =
      if (qp >= 24) (c * ls(qp % 6, i, j)) << (qp / 6 - 4)
      else (c * ls(qp % 6, i, j) + (1 << (3 - qp / 6))) >> (4 - qp / 6)

    def idct(d: Array[Array[Int]]): Array[Array[Int]] = {
      val e = Array.ofDim[Int](4, 4)
      for (i <- 0 until 4) {
        e(i)(0) = d(i)(0) + d(i)(2)
        e(i)(1) = d(i)(0) - d(i)(2)
        e(i)(2) = (d(i)(1) >> 1) - d(i)(3)
        e(i)(3) = d(i)(1) + (d(i)(3) >> 1)
      }
      val f = Array.ofDim[Int](4, 4)
      for (i <- 0 until 4) {
        f(i)(0) = e(i)(0) + e(i)(3); f(i)(1) = e(i)(1) + e(i)(2)
        f(i)(2) = e(i)(1) - e(i)(2); f(i)(3) = e(i)(0) - e(i)(3)
      }
      val g = Array.ofDim[Int](4, 4)
      for (j <- 0 until 4) {
        g(0)(j) = f(0)(j) + f(2)(j)
        g(1)(j) = f(0)(j) - f(2)(j)
        g(2)(j) = (f(1)(j) >> 1) - f(3)(j)
        g(3)(j) = f(1)(j) + (f(3)(j) >> 1)
      }
      val r = Array.ofDim[Int](4, 4)
      for (j <- 0 until 4) {
        r(0)(j) = (g(0)(j) + g(3)(j) + 32) >> 6
        r(1)(j) = (g(1)(j) + g(2)(j) + 32) >> 6
        r(2)(j) = (g(1)(j) - g(2)(j) + 32) >> 6
        r(3)(j) = (g(0)(j) - g(3)(j) + 32) >> 6
      }
      r
    }

    def predict(mode: Int, plane: Array[Int], w: Int, mbX: Int, mbY: Int,
                left: Boolean, top: Boolean): Array[Array[Int]] = {
      val p = Array.ofDim[Int](16, 16)
      def t(x: Int) = plane((mbY - 1) * w + mbX + x)
      def l(y: Int) = plane((mbY + y) * w + mbX - 1)
      mode match {
        case 0 => for (y <- 0 until 16; x <- 0 until 16) p(y)(x) = t(x)
        case 1 => for (y <- 0 until 16; x <- 0 until 16) p(y)(x) = l(y)
        case 2 =>
          val v = if (top && left)
              ((0 until 16).map(t).sum + (0 until 16).map(l).sum + 16) >> 5
            else if (top) ((0 until 16).map(t).sum + 8) >> 4
            else if (left) ((0 until 16).map(l).sum + 8) >> 4
            else 128
          for (y <- 0 until 16; x <- 0 until 16) p(y)(x) = v
        case 3 =>
          def tl = plane((mbY - 1) * w + mbX - 1)
          val hh = (0 until 8).map(x =>
            (x + 1) * (t(8 + x) - (if (x == 7) tl else t(6 - x)))).sum
          val vv = (0 until 8).map(y =>
            (y + 1) * (l(8 + y) - (if (y == 7) tl else l(6 - y)))).sum
          val a = 16 * (l(15) + t(15))
          val b = (5 * hh + 32) >> 6
          val c = (5 * vv + 32) >> 6
          for (y <- 0 until 16; x <- 0 until 16)
            p(y)(x) = clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
      }
      p
    }

    /** Independent 4x4 intra prediction (§8.3.1.2) via a p(x, y) sample
      * accessor over the partially reconstructed plane, x ∈ -1..7,
      * y ∈ -1..3 in block-local coordinates. Top-right samples
      * substitute p(3, -1) when that block is later in decode order.
      */
    def predict4(mode: Int, plane: Array[Int], w: Int, x0: Int, y0: Int,
                 trOk: Boolean): Array[Array[Int]] = {
      val left = x0 > 0
      val top = y0 > 0
      def p(x: Int, y: Int): Int =
        if (y == -1 && x >= 4 && !trOk) plane((y0 - 1) * w + x0 + 3)
        else plane((y0 + y) * w + x0 + x)
      val out = Array.ofDim[Int](4, 4)
      for (y <- 0 until 4; x <- 0 until 4) out(y)(x) = mode match {
        case 0 => p(x, -1)
        case 1 => p(-1, y)
        case 2 =>
          if (top && left)
            ((0 to 3).map(p(_, -1)).sum + (0 to 3).map(p(-1, _)).sum + 4) >> 3
          else if (top) ((0 to 3).map(p(_, -1)).sum + 2) >> 2
          else if (left) ((0 to 3).map(p(-1, _)).sum + 2) >> 2
          else 128
        case 3 =>
          if (x == 3 && y == 3) (p(6, -1) + 3 * p(7, -1) + 2) >> 2
          else (p(x + y, -1) + 2 * p(x + y + 1, -1) + p(x + y + 2, -1) + 2) >> 2
        case 4 =>
          if (x > y) (p(x - y - 2, -1) + 2 * p(x - y - 1, -1) + p(x - y, -1) + 2) >> 2
          else if (x < y)
            (p(-1, y - x - 2) + 2 * p(-1, y - x - 1) + p(-1, y - x) + 2) >> 2
          else (p(0, -1) + 2 * p(-1, -1) + p(-1, 0) + 2) >> 2
        case 5 =>
          val z = 2 * x - y
          if (z >= 0 && z % 2 == 0)
            (p(x - (y >> 1) - 1, -1) + p(x - (y >> 1), -1) + 1) >> 1
          else if (z > 0)
            (p(x - (y >> 1) - 2, -1) + 2 * p(x - (y >> 1) - 1, -1) +
              p(x - (y >> 1), -1) + 2) >> 2
          else if (z == -1) (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
          else (p(-1, y - 1) + 2 * p(-1, y - 2) + p(-1, y - 3) + 2) >> 2
        case 6 =>
          val z = 2 * y - x
          if (z >= 0 && z % 2 == 0)
            (p(-1, y - (x >> 1) - 1) + p(-1, y - (x >> 1)) + 1) >> 1
          else if (z > 0)
            (p(-1, y - (x >> 1) - 2) + 2 * p(-1, y - (x >> 1) - 1) +
              p(-1, y - (x >> 1)) + 2) >> 2
          else if (z == -1) (p(-1, 0) + 2 * p(-1, -1) + p(0, -1) + 2) >> 2
          else (p(x - 1, -1) + 2 * p(x - 2, -1) + p(x - 3, -1) + 2) >> 2
        case 7 =>
          if (y % 2 == 0) (p(x + (y >> 1), -1) + p(x + (y >> 1) + 1, -1) + 1) >> 1
          else (p(x + (y >> 1), -1) + 2 * p(x + (y >> 1) + 1, -1) +
            p(x + (y >> 1) + 2, -1) + 2) >> 2
        case 8 =>
          val z = x + 2 * y
          if (z < 5 && z % 2 == 0)
            (p(-1, y + (x >> 1)) + p(-1, y + (x >> 1) + 1) + 1) >> 1
          else if (z < 5)
            (p(-1, y + (x >> 1)) + 2 * p(-1, y + (x >> 1) + 1) +
              p(-1, y + (x >> 1) + 2) + 2) >> 2
          else if (z == 5) (p(-1, 2) + 3 * p(-1, 3) + 2) >> 2
          else p(-1, 3)
      }
      out
    }

    // raster (by*4+bx) → decode-order blkIdx within a macroblock:
    // literal Z-scan table (independent of the engine's bit formula)
    private val zScan =
      Array(0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15)

    /** Reconstruct the whole frame from the fixture's own MB list. */
    def frame(wMbs: Int, hMbs: Int,
              mbs: Seq[VideoFixture.FixMb],
              sliceQp: Int): Array[Int] = {
      val w = wMbs * 16
      val plane = new Array[Int](w * hMbs * 16)
      var qp = sliceQp
      for ((entry, mb) <- mbs.zipWithIndex) {
        val mbX = (mb % wMbs) * 16
        val mbY = (mb / wMbs) * 16
        entry match {
          case VideoFixture.PcmMb(lum) =>
            for (y <- 0 until 16; x <- 0 until 16)
              plane((mbY + y) * w + mbX + x) = lum
          case m: VideoFixture.I16Mb =>
            qp = (qp + m.qpDelta + 52) % 52
            val pred = predict(m.predMode, plane, w, mbX, mbY,
              mbX > 0, mbY > 0)
            val dcArr = Array.ofDim[Int](4, 4)
            for (k <- 0 until 16) {
              val p = zig(k); dcArr(p / 4)(p % 4) = m.dcLevels(k)
            }
            val dc = hadamard(dcArr).map(_.map(dcOut(_, qp)))
            for (blk <- 0 until 16) {
              val bx = ((blk >> 2) & 1) * 2 + (blk & 1)
              val by = ((blk >> 2) >> 1) * 2 + ((blk >> 1) & 1)
              val d = Array.ofDim[Int](4, 4)
              for (lv <- m.acLevels; k <- 1 until 16 if lv(blk)(k - 1) != 0) {
                val p = zig(k)
                d(p / 4)(p % 4) = acOut(lv(blk)(k - 1), qp, p / 4, p % 4)
              }
              d(0)(0) = dc(by)(bx)
              val r = idct(d)
              for (yy <- 0 until 4; xx <- 0 until 4)
                plane((mbY + by * 4 + yy) * w + mbX + bx * 4 + xx) =
                  clip(pred(by * 4 + yy)(bx * 4 + xx) + r(yy)(xx))
            }
          case m: VideoFixture.I4Mb =>
            if ((m.cbpLuma | m.chromaCbp) != 0) qp = (qp + m.qpDelta + 52) % 52
            for (blk <- 0 until 16) {
              val bx = ((blk >> 2) & 1) * 2 + (blk & 1)
              val by = ((blk >> 2) >> 1) * 2 + ((blk >> 1) & 1)
              val x0 = mbX + bx * 4
              val y0 = mbY + by * 4
              // top-right decode-order availability: the block holding
              // (x0+4, y0-1) must precede this one (MB raster + Z-scan)
              val trOk = y0 > 0 && x0 + 4 < w && {
                def ord(px: Int, py: Int): Long = {
                  val (bc, br) = (px / 16, py / 16)
                  val (lx, ly) = ((px % 16) / 4, (py % 16) / 4)
                  (br.toLong * wMbs + bc) * 16 + zScan(ly * 4 + lx)
                }
                ord(x0 + 4, y0 - 1) < ord(x0, y0)
              }
              val pred = predict4(m.modes(blk), plane, w, x0, y0, trOk)
              val d = Array.ofDim[Int](4, 4)
              if ((m.cbpLuma & (1 << (blk >> 2))) != 0)
                for (k <- 0 until 16 if m.levels(blk)(k) != 0) {
                  val p = zig(k)
                  d(p / 4)(p % 4) = acOut(m.levels(blk)(k), qp, p / 4, p % 4)
                }
              val r = idct(d)
              for (yy <- 0 until 4; xx <- 0 until 4)
                plane((y0 + yy) * w + x0 + xx) =
                  clip(pred(yy)(xx) + r(yy)(xx))
            }
        }
      }
      plane
    }
  }

  private def wrapI16(m: VideoFixture.I16Mb): VideoFixture.FixMb = m

  private def decodeVs(wMbs: Int, hMbs: Int,
                       mbs: Seq[VideoFixture.FixMb],
                       sliceQpDelta: Int): Unit = {
    val mp4 = VideoFixture.mp4(wMbs * 16, hMbs * 16,
      VideoFixture.sps(wMbs, hMbs), VideoFixture.pps(),
      Seq(VideoFixture.idrI16Slice(wMbs, hMbs, mbs, sliceQpDelta)))
    val Some((w, h, got)) = H264.decodeFrame(mp4, 0)
    assert(w == wMbs * 16 && h == hMbs * 16)
    val want = Ref.frame(wMbs, hMbs, mbs, 26 + sliceQpDelta)
    val diffs = (0 until w * h).filter(i => (got(i) & 0xFF) != want(i))
    assert(diffs.isEmpty,
      s"${diffs.size} pixel diffs, first at ${diffs.headOption}: " +
        diffs.take(5).map(i => s"[$i] got=${got(i) & 0xFF} want=${want(i)}")
          .mkString(", "))
  }

  private def ac(spec: (Int, Int)*): Array[Array[Int]] =
    Array.fill(16)(new Array[Int](15)).zipWithIndex.map { case (a, blk) =>
      for ((k, v) <- spec) a((k + blk) % 15) = v + (blk % 3)
      a
    }

  test("I_16x16 frame: all four prediction modes + residuals reconstruct bit-exactly (QP 26)") {
    val dc0 = Array(6, -3, 2, 0, 1) ++ Array.fill(11)(0)
    val dc1 = Array(-5, 2, 1) ++ Array.fill(13)(0)
    val dc3 = Array(1, 1, -1, 0, 0, 2) ++ Array.fill(10)(0)
    decodeVs(2, 2, Seq(
      wrapI16(VideoFixture.I16Mb(2, dc0)),                       // DC, no nbrs
      wrapI16(VideoFixture.I16Mb(1, dc1,
        Some(ac(0 -> 3, 5 -> -1)), chromaCbp = 1)),            // horizontal
      wrapI16(VideoFixture.I16Mb(0, new Array[Int](16),
        Some(ac(0 -> 2, 2 -> -2, 7 -> 1, 11 -> 1)), chromaCbp = 2)), // vertical
      wrapI16(VideoFixture.I16Mb(3, dc3, Some(ac(1 -> -4, 9 -> 2))))), // plane
      sliceQpDelta = 0)
  }

  test("QP paths: high QP (>=36 DC shift), low QP rounding, mb_qp_delta wrap") {
    val dc = Array(3, -2, 1) ++ Array.fill(13)(0)
    decodeVs(2, 2, Seq(
      wrapI16(VideoFixture.I16Mb(2, dc)),                       // QP 40 branch
      wrapI16(VideoFixture.I16Mb(2, dc,
        Some(ac(0 -> 5, 3 -> -3)), qpDelta = -30)),           // QP 10 branch
      wrapI16(VideoFixture.I16Mb(0, dc,
        Some(ac(2 -> 2)), qpDelta = 20)),                     // QP 30
      wrapI16(VideoFixture.I16Mb(3, dc))),                      // QP 30 plane
      sliceQpDelta = 14)
  }

  test("mixed I_PCM + I_16x16 slice: PCM neighbors drive nC >= 8 (FLC coeff_token) and escape-coded levels") {
    // dense AC blocks (14 coefficients, one level 40 -> the 12-bit escape)
    val dense = Array.fill(16)(new Array[Int](15)).map { a =>
      for (k <- 0 until 14) a(k) = if (k == 0) 40 else if (k % 2 == 0) 2 else -1
      a
    }
    val dc = Array(2, -1) ++ Array.fill(14)(0)
    decodeVs(2, 2, Seq(
      VideoFixture.PcmMb(80), VideoFixture.PcmMb(200),
      wrapI16(VideoFixture.I16Mb(0, dc, Some(dense))),  // vertical from PCM
      wrapI16(VideoFixture.I16Mb(2, dc, Some(ac(0 -> 2, 4 -> -2))))),
      sliceQpDelta = 0)
  }

  private def lv16(spec: (Int, Int)*): Array[Int] = {
    val a = new Array[Int](16)
    for ((k, v) <- spec) a(k) = v
    a
  }

  test("I_4x4 frame: all nine 4x4 prediction modes + residuals reconstruct bit-exactly") {
    val none = Array.fill(16)(new Array[Int](16))
    def lv(f: Int => Seq[(Int, Int)]): Array[Array[Int]] =
      Array.tabulate(16)(blk => lv16(f(blk): _*))
    // MB0 covers all nine modes across its 16 blocks (edge-legal at the
    // frame corner: DC where neighbors are missing)
    val mb0 = VideoFixture.I4Mb(
      Array(2, 1, 0, 4, 8, 2, 3, 7, 0, 5, 2, 6, 4, 3, 7, 8),
      cbpLuma = 6, // 8x8 quads 1 and 2 coded (blocks 4..11)
      levels = lv(blk => Seq(0 -> (blk % 5 - 2), 3 -> 1, 9 -> -1)
        .filter(_._2 != 0)))
    val mb1 = VideoFixture.I4Mb(
      Array(1, 8, 0, 4, 1, 2, 3, 7, 5, 6, 0, 4, 3, 7, 8, 2),
      cbpLuma = 15, // dense: every block coded, drives nC upward
      levels = lv(blk => (0 until 10).map(k => k -> (if (k % 2 == 0) 2 else -1))),
      qpDelta = -8, chromaCbp = 2)
    val mb2 = VideoFixture.I4Mb(
      Array(3, 4, 7, 5, 0, 2, 6, 8, 2, 1, 0, 4, 7, 3, 5, 6),
      cbpLuma = 0, levels = none, qpDelta = 6, chromaCbp = 1)
    val mb3 = VideoFixture.I4Mb(
      Array(4, 5, 6, 8, 3, 7, 0, 1, 2, 4, 5, 6, 7, 8, 3, 0),
      cbpLuma = 9, // quads 0 and 3
      levels = lv(blk => Seq(0 -> (if (blk == 0) 40 else 3), 5 -> -2)))
    decodeVs(2, 2, Seq(mb0, mb1, mb2, mb3), sliceQpDelta = 0)
  }

  test("mixed I_4x4 + I_16x16 + I_PCM: non-I4x4 neighbors predict as DC; grids stay in sync") {
    val dc = Array(4, -2, 1) ++ Array.fill(13)(0)
    val mb2 = VideoFixture.I4Mb(
      // top neighbor is the I_16x16 MB -> contributes DC to the most-
      // probable-mode rule; left is the frame edge
      Array(2, 4, 7, 5, 0, 2, 6, 8, 2, 1, 0, 4, 7, 3, 5, 6),
      cbpLuma = 5, // quads 0 and 2
      levels = Array.tabulate(16)(blk => lv16(1 -> (blk % 3 + 2), 7 -> -1)),
      chromaCbp = 1)
    val mb3 = VideoFixture.I4Mb(
      // top neighbor is the I_PCM MB (DC contribution + nC 16 neighbors)
      Array(1, 0, 4, 5, 2, 3, 6, 7, 8, 0, 1, 4, 5, 6, 7, 3),
      cbpLuma = 15,
      levels = Array.tabulate(16)(blk => lv16(0 -> 2, 2 -> -3, 11 -> 1)),
      qpDelta = 4)
    decodeVs(2, 2, Seq(
      wrapI16(VideoFixture.I16Mb(2, dc, Some(ac(0 -> 3)))),
      VideoFixture.PcmMb(200), mb2, mb3), sliceQpDelta = -2)
  }

  test("Table 9-4 intra CBP mapping is a permutation of 0..47") {
    assert(H264.CbpIntra.sorted.toSeq == (0 to 47))
  }

  test("end-to-end: sampleVideoFrames emits decoded=true with real features for a CAVLC MP4") {
    val spark = SparkTestBase.spark
    val mp4 = VideoFixture.mp4(32, 32, VideoFixture.sps(2, 2),
      VideoFixture.pps(), Seq(VideoFixture.idrI16Slice(2, 2, Seq(
        wrapI16(VideoFixture.I16Mb(2, Array(6, -3, 2) ++ Array.fill(13)(0))),
        wrapI16(VideoFixture.I16Mb(1, new Array[Int](16))),
        wrapI16(VideoFixture.I16Mb(0, new Array[Int](16))),
        wrapI16(VideoFixture.I16Mb(2, new Array[Int](16)))))))
    val rows = Seq(org.apache.spark.sql.Row(1L, mp4,
      org.apache.spark.sql.Row("mp4", 32, 32, 0L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      graft.multimodal.Multimodal.MediaSchema)
    val got = graft.multimodal.Multimodal.sampleVideoFrames(df, everyMs = 1000)
      .collect()
    assert(got.nonEmpty && got.forall(_.getAs[Boolean]("decoded")))
  }

  test("fuzz: random and bit-flipped MP4 payloads never throw — degrade only") {
    val rnd = new scala.util.Random(1453)
    for (sz <- Seq(0, 1, 17, 128, 1024, 8192)) {
      val junk = Array.fill(sz)(rnd.nextInt(256).toByte)
      H264.decodeFrame(junk, 0)
      graft.multimodal.Multimodal.decodeVideoFrame(junk, 0)
    }
    val good = VideoFixture.mp4(32, 32, VideoFixture.sps(2, 2),
      VideoFixture.pps(), Seq(VideoFixture.idrI16Slice(2, 2, Seq(
        wrapI16(VideoFixture.I16Mb(2, Array(6, -3, 2) ++ Array.fill(13)(0))),
        wrapI16(VideoFixture.I16Mb(1, new Array[Int](16))),
        wrapI16(VideoFixture.I16Mb(3, new Array[Int](16))),
        wrapI16(VideoFixture.I16Mb(0, new Array[Int](16)))))))
    // single-bit corruptions anywhere in the file: any outcome is fine
    // (None, or a frame when the flip lands in a don't-care byte) — an
    // escaped exception is not
    for (_ <- 0 until 300) {
      val mutated = good.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      graft.multimodal.Multimodal.decodeVideoFrame(mutated, 0)
    }
    for (k <- 1 until 10)
      graft.multimodal.Multimodal.decodeVideoFrame(good.take(good.length * k / 10), 0)
  }
}
