package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.multimodal.{Multimodal, Vp8, Vp8Tables}
import Vp8Fixture.{BoolEncoder, FrameCfg, Mb}

/** VP8 keyframe decode laws. The container ships no VP8 encoder or
  * conformance vectors, so the suite pins everything pinnable without
  * one (the same strategy as CavlcSpec for H.264):
  *
  *  - the boolean decoder against an INDEPENDENT arbitrary-precision
  *    arithmetic encoder (BigInt interval vs the engine's carry-free
  *    sliding window) over randomized probability/bit sequences;
  *  - structural table laws (tree completeness, zigzag permutation,
  *    monotone quantizer lookups with published endpoints, probability
  *    ranges);
  *  - full-frame reconstruction against an INDEPENDENT second
  *    transcription of the spec math (2-D matrix loops here vs the
  *    engine's flat-array butterflies), across modes, token categories,
  *    quantizer deltas, segmentation, multi-partition streams, skip
  *    macroblocks, non-MB-aligned crops, and the §15 loop filter across
  *    levels / sharpness / filter types / per-segment and delta-adjusted
  *    levels (independent functional-window transcription vs the
  *    engine's in-place Edge filters);
  *  - the honest-degrade contract (inter frames, B_PRED, lacing,
  *    foreign codec ids, truncation → None).
  */
class Vp8Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  // ---- boolean coder ------------------------------------------------------

  private def decoderOf(bytes: Array[Byte]) = new Vp8.BoolDecoder(bytes, 0, bytes.length)

  test("bool coder: randomized encoder/decoder agreement") {
    val rnd = new scala.util.Random(8842)
    for (run <- 0 until 25) {
      val n = 200 + rnd.nextInt(2800)
      val probs = Array.fill(n)(1 + rnd.nextInt(254))
      val bits = Array.fill(n)(rnd.nextInt(2))
      val e = new BoolEncoder
      var i = 0
      while (i < n) { e.bool(probs(i), bits(i)); i += 1 }
      val d = decoderOf(e.bytes)
      i = 0
      while (i < n) {
        assert(d.bool(probs(i)) == bits(i), s"run $run symbol $i")
        i += 1
      }
    }
  }

  test("bool coder: literal and signed-literal round-trips") {
    val e = new BoolEncoder
    e.literal(0x5A, 8); e.literal(3, 2); e.signedLiteral(-9, 6)
    e.signedLiteral(17, 7); e.literal(0x1FFF, 14)
    val d = decoderOf(e.bytes)
    assert(d.literal(8) == 0x5A)
    assert(d.literal(2) == 3)
    assert(d.signedLiteral(6) == -9)
    assert(d.signedLiteral(7) == 17)
    assert(d.literal(14) == 0x1FFF)
  }

  test("bool coder: every tree symbol round-trips, including EOB-suppressed reads") {
    val trees = Seq(
      (Vp8Tables.KfYModeTree, Vp8Tables.KfYModeProb, 0 to 4),
      (Vp8Tables.UvModeTree, Vp8Tables.KfUvModeProb, 0 to 3),
      (Vp8Tables.SegTree, Array(100, 200, 37), 0 to 3),
      (Vp8Tables.TokenTree, Array(10, 60, 110, 160, 210, 250, 30, 80, 130, 180, 230), 0 to 11))
    for ((t, p, syms) <- trees; s <- syms) {
      val e = new BoolEncoder
      e.tree(t, p, s)
      assert(decoderOf(e.bytes).tree(t, p) == s)
    }
    // startNode = 2 skips the EOB branch of the token tree
    for (s <- 0 to 10) {
      val p = Array(10, 60, 110, 160, 210, 250, 30, 80, 130, 180, 230)
      val e = new BoolEncoder
      e.tree(Vp8Tables.TokenTree, p, s, startNode = 2)
      assert(decoderOf(e.bytes).tree(Vp8Tables.TokenTree, p, startNode = 2) == s)
    }
  }

  test("bool decoder: an all-zero stream decodes to zero bits; overread throws") {
    val d = decoderOf(new Array[Byte](4))
    for (_ <- 0 until 16) assert(d.bool(128) == 0)
    val tiny = decoderOf(Array[Byte](0x12))
    intercept[IllegalStateException] {
      for (_ <- 0 until 200) tiny.bool(3) // prob 3 drains a byte per ~0 bit
    }
  }

  // ---- table laws -----------------------------------------------------------

  private def leaves(t: Array[Int]): Seq[Int] = t.filter(_ <= 0).map(-_).toSeq

  test("tables: trees are complete binary trees over their symbol sets") {
    assert(leaves(Vp8Tables.KfYModeTree).sorted == Seq(0, 1, 2, 3, 4))
    assert(leaves(Vp8Tables.UvModeTree).sorted == Seq(0, 1, 2, 3))
    assert(leaves(Vp8Tables.SegTree).sorted == Seq(0, 1, 2, 3))
    assert(leaves(Vp8Tables.TokenTree).sorted == (0 to 11))
    // every internal pointer is an even in-range index
    for (t <- Seq(Vp8Tables.KfYModeTree, Vp8Tables.UvModeTree,
      Vp8Tables.SegTree, Vp8Tables.TokenTree); v <- t if v > 0)
      assert(v % 2 == 0 && v < t.length)
  }

  test("tables: zigzag is a 16-permutation; bands map 16 positions into 0..7") {
    assert(Vp8Tables.Zigzag.sorted.toSeq == (0 until 16))
    assert(Vp8Tables.CoeffBands.length == 16)
    assert(Vp8Tables.CoeffBands.forall(b => b >= 0 && b <= 7))
  }

  test("tables: quantizer lookups are monotone with the published endpoints") {
    for (t <- Seq(Vp8Tables.DcQLookup, Vp8Tables.AcQLookup)) {
      assert(t.length == 128)
      assert(t.zip(t.tail).forall { case (a, b) => a <= b }, "non-monotone")
    }
    assert(Vp8Tables.DcQLookup.head == 4 && Vp8Tables.DcQLookup.last == 157)
    assert(Vp8Tables.AcQLookup.head == 4 && Vp8Tables.AcQLookup.last == 284)
  }

  test("tables: probability arrays have the 4x8x3x11 shape and 1..255 values") {
    for (t <- Seq(Vp8Tables.coeffUpdateProbs, Vp8Tables.defaultCoeffProbs)) {
      assert(t.length == 4 && t.forall(_.length == 8))
      assert(t.flatten.forall(_.length == 3))
      assert(t.flatten.flatten.forall(_.length == 11))
      assert(t.flatten.flatten.flatten.forall(p => p >= 1 && p <= 255))
    }
    assert(Vp8Tables.CatProbs.map(_.length).toSeq == Seq(1, 2, 3, 4, 5, 11))
    assert(Vp8Tables.CatBase.toSeq == Seq(5, 7, 11, 19, 35, 67))
    // category ranges tile [5, 2114] with no gap: base(i+1) = base(i) + 2^bits(i)
    for (i <- 0 until 5)
      assert(Vp8Tables.CatBase(i + 1) ==
        Vp8Tables.CatBase(i) + (1 << Vp8Tables.CatProbs(i).length))
  }

  // ---- independent second transcription of the reconstruction math --------

  private val M = Array(
    Array(1, 1, 1, 1), Array(1, 1, -1, -1), Array(1, -1, -1, 1), Array(1, -1, 1, -1))

  /** Inverse WHT as explicit matrix algebra: O = (M·X·Mᵀ + 3) >> 3. */
  private def indepIwht(in: Array[Int]): Array[Int] = {
    val X = Array.tabulate(4, 4)((r, c) => in(4 * r + c))
    val T = Array.tabulate(4, 4)((r, c) => (0 until 4).map(k => M(r)(k) * X(k)(c)).sum)
    val O = Array.tabulate(4, 4)((r, c) =>
      Math.floorDiv((0 until 4).map(k => T(r)(k) * M(c)(k)).sum + 3, 8))
    O.flatten
  }

  private def m1(x: Int): Int = x + ((x * 20091) >> 16)
  private def m2(x: Int): Int = (x * 35468) >> 16

  /** Inverse DCT as 2-D passes with named multiplier helpers. */
  private def indepIdct(in: Array[Int]): Array[Int] = {
    val X = Array.tabulate(4, 4)((r, c) => in(4 * r + c))
    val T = Array.ofDim[Int](4, 4)
    for (c <- 0 until 4) {
      val (x0, x1, x2, x3) = (X(0)(c), X(1)(c), X(2)(c), X(3)(c))
      T(0)(c) = x0 + x2 + m1(x1) + m2(x3)
      T(1)(c) = x0 - x2 + m2(x1) - m1(x3)
      T(2)(c) = x0 - x2 - m2(x1) + m1(x3)
      T(3)(c) = x0 + x2 - m1(x1) - m2(x3)
    }
    val O = Array.ofDim[Int](4, 4)
    for (r <- 0 until 4) {
      val (t0, t1, t2, t3) = (T(r)(0), T(r)(1), T(r)(2), T(r)(3))
      def fd(x: Int) = Math.floorDiv(x + 4, 8)
      O(r)(0) = fd(t0 + t2 + m1(t1) + m2(t3))
      O(r)(1) = fd(t0 - t2 + m2(t1) - m1(t3))
      O(r)(2) = fd(t0 - t2 - m2(t1) + m1(t3))
      O(r)(3) = fd(t0 + t2 - m1(t1) - m2(t3))
    }
    O.flatten
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- independent §15 loop filter transcription ---------------------------
  // Functional style over extracted 8-sample windows (the engine filters
  // in place through an Edge accessor).

  private def sc(v: Int): Int = math.max(-128, math.min(127, v))

  /** (interior, mb-edge blimit, subblock blimit, keyframe hev thresh). */
  private def indepLimits(level: Int, sharp: Int): (Int, Int, Int, Int) = {
    var il = level
    if (sharp > 0) {
      il = il >> (if (sharp > 4) 2 else 1)
      il = math.min(il, 9 - sharp)
    }
    il = math.max(il, 1)
    (il, (level + 2) * 2 + il, level * 2 + il,
      if (level >= 40) 2 else if (level >= 15) 1 else 0)
  }

  /** s = [p3 p2 p1 p0 q0 q1 q2 q3] → filtered copy (normal subblock). */
  private def indepNormal(lim: Int, blim: Int, thr: Int, s: Array[Int]): Array[Int] = {
    val Array(p3, p2, p1, p0, q0, q1, q2, q3) = s
    val mask = math.abs(p3 - p2) <= lim && math.abs(p2 - p1) <= lim &&
      math.abs(p1 - p0) <= lim && math.abs(q1 - q0) <= lim &&
      math.abs(q2 - q1) <= lim && math.abs(q3 - q2) <= lim &&
      math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= blim
    if (!mask) return s
    val hev = math.abs(p1 - p0) > thr || math.abs(q1 - q0) > thr
    val (ps1, ps0, qs0, qs1) = (p1 - 128, p0 - 128, q0 - 128, q1 - 128)
    val f = sc((if (hev) sc(ps1 - qs1) else 0) + 3 * (qs0 - ps0))
    val f1 = sc(f + 4) >> 3
    val f2 = sc(f + 3) >> 3
    val out = s.clone()
    out(4) = sc(qs0 - f1) + 128
    out(3) = sc(ps0 + f2) + 128
    if (!hev) {
      val a = (f1 + 1) >> 1
      out(5) = sc(qs1 - a) + 128
      out(2) = sc(ps1 + a) + 128
    }
    out
  }

  /** s → filtered copy (macroblock edge, 27/18/9 taper). */
  private def indepMbEdge(lim: Int, blim: Int, thr: Int, s: Array[Int]): Array[Int] = {
    val Array(p3, p2, p1, p0, q0, q1, q2, q3) = s
    val mask = math.abs(p3 - p2) <= lim && math.abs(p2 - p1) <= lim &&
      math.abs(p1 - p0) <= lim && math.abs(q1 - q0) <= lim &&
      math.abs(q2 - q1) <= lim && math.abs(q3 - q2) <= lim &&
      math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= blim
    if (!mask) return s
    val hev = math.abs(p1 - p0) > thr || math.abs(q1 - q0) > thr
    val (ps2, ps1, ps0, qs0, qs1, qs2) =
      (p2 - 128, p1 - 128, p0 - 128, q0 - 128, q1 - 128, q2 - 128)
    val f = sc(sc(ps1 - qs1) + 3 * (qs0 - ps0))
    val fh = if (hev) f else 0
    val q0h = sc(qs0 - (sc(fh + 4) >> 3))
    val p0h = sc(ps0 + (sc(fh + 3) >> 3))
    val fw = if (hev) 0 else f
    val u27 = sc((63 + fw * 27) >> 7)
    val u18 = sc((63 + fw * 18) >> 7)
    val u9 = sc((63 + fw * 9) >> 7)
    val out = s.clone()
    out(4) = sc(q0h - u27) + 128
    out(3) = sc(p0h + u27) + 128
    out(5) = sc(qs1 - u18) + 128
    out(2) = sc(ps1 + u18) + 128
    out(6) = sc(qs2 - u9) + 128
    out(1) = sc(ps2 + u9) + 128
    out
  }

  /** s → filtered copy (simple filter: blimit-only mask, p0/q0 only). */
  private def indepSimple(blim: Int, s: Array[Int]): Array[Int] = {
    val Array(_, _, p1, p0, q0, q1, _, _) = s
    if (math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 > blim) return s
    val (ps1, ps0, qs0, qs1) = (p1 - 128, p0 - 128, q0 - 128, q1 - 128)
    val f = sc(sc(ps1 - qs1) + 3 * (qs0 - ps0))
    val out = s.clone()
    out(4) = sc(qs0 - (sc(f + 4) >> 3)) + 128
    out(3) = sc(ps0 + (sc(f + 3) >> 3)) + 128
    out
  }

  /** Apply the frame filter to the 2-D plane in the normative per-MB
    * raster order: left MB edge, internal vertical, top MB edge,
    * internal horizontal; internal edges only for MBs with coefficients.
    */
  private def indepLoopFilter(P: Array[Array[Int]], mbW: Int, mbH: Int,
                              levels: Seq[Int], hasCoeffs: Seq[Boolean],
                              sharp: Int, simple: Boolean): Unit = {
    def readV(y: Int, x: Int) = Array.tabulate(8)(k => P(y)(x - 4 + k))
    def writeV(y: Int, x: Int, s: Array[Int]): Unit =
      for (k <- 0 until 8) P(y)(x - 4 + k) = s(k)
    def readH(y: Int, x: Int) = Array.tabulate(8)(k => P(y - 4 + k)(x))
    def writeH(y: Int, x: Int, s: Array[Int]): Unit =
      for (k <- 0 until 8) P(y - 4 + k)(x) = s(k)
    for (mby <- 0 until mbH; mbx <- 0 until mbW) {
      val level = levels(mby * mbW + mbx)
      if (level > 0) {
        val (il, mblim, sblim, thr) = indepLimits(level, sharp)
        val x0 = mbx * 16; val y0 = mby * 16
        def mbf(s: Array[Int], bl: Int) =
          if (simple) indepSimple(bl, s) else indepMbEdge(il, bl, thr, s)
        def sbf(s: Array[Int], bl: Int) =
          if (simple) indepSimple(bl, s) else indepNormal(il, bl, thr, s)
        if (mbx > 0)
          for (r <- 0 until 16) writeV(y0 + r, x0, mbf(readV(y0 + r, x0), mblim))
        if (hasCoeffs(mby * mbW + mbx))
          for (dx <- Seq(4, 8, 12); r <- 0 until 16)
            writeV(y0 + r, x0 + dx, sbf(readV(y0 + r, x0 + dx), sblim))
        if (mby > 0)
          for (c <- 0 until 16) writeH(y0, x0 + c, mbf(readH(y0, x0 + c), mblim))
        if (hasCoeffs(mby * mbW + mbx))
          for (dy <- Seq(4, 8, 12); c <- 0 until 16)
            writeH(y0 + dy, x0 + c, sbf(readH(y0 + dy, x0 + c), sblim))
      }
    }
  }

  /** Independent luma reconstruction of a fixture frame: dequant →
    * (IWHT for Y2) → prediction from the already-reconstructed plane →
    * IDCT residual add, all in plain 2-D Int arrays.
    */
  private def indepLuma(w: Int, h: Int, mbs: Seq[Mb], cfg: FrameCfg): Array[Int] = {
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val P = Array.ofDim[Int](mbH * 16, mbW * 16)
    def clampQ(q: Int) = math.max(0, math.min(127, q))
    for (mby <- 0 until mbH; mbx <- 0 until mbW) {
      val m = mbs(mby * mbW + mbx)
      val q = clampQ(cfg.segment match {
        case Some((qs, abs)) => if (abs) qs(m.segId) else cfg.q + qs(m.segId)
        case None => cfg.q
      })
      val y1ac = Vp8Tables.AcQLookup(q)
      val y2dc = Vp8Tables.DcQLookup(clampQ(q + cfg.y2DcDelta)) * 2
      val y2ac = math.max(8, Vp8Tables.AcQLookup(clampQ(q + cfg.y2AcDelta)) * 155 / 100)
      // prediction from decoded neighbors, spec border conventions
      val x0 = mbx * 16; val y0 = mby * 16
      def above(j: Int) = if (mby == 0) 127 else P(y0 - 1)(x0 + j)
      def left(i: Int) = if (mbx == 0) 129 else P(y0 + i)(x0 - 1)
      val corner = if (mby == 0) 127 else if (mbx == 0) 129 else P(y0 - 1)(x0 - 1)
      val pred = Array.ofDim[Int](16, 16)
      m.yMode match {
        case Vp8Tables.DcPred =>
          val dc =
            if (mbx == 0 && mby == 0) 128
            else if (mby == 0) ((0 until 16).map(left).sum + 8) >> 4
            else if (mbx == 0) ((0 until 16).map(above).sum + 8) >> 4
            else ((0 until 16).map(above).sum + (0 until 16).map(left).sum + 16) >> 5
          for (i <- 0 until 16; j <- 0 until 16) pred(i)(j) = dc
        case Vp8Tables.VPred =>
          for (i <- 0 until 16; j <- 0 until 16) pred(i)(j) = above(j)
        case Vp8Tables.HPred =>
          for (i <- 0 until 16; j <- 0 until 16) pred(i)(j) = left(i)
        case Vp8Tables.TmPred =>
          for (i <- 0 until 16; j <- 0 until 16)
            pred(i)(j) = clamp255(left(i) + above(j) - corner)
      }
      // residuals (skip → zero residual)
      val res = Array.ofDim[Int](16, 16)
      if (!m.skip) {
        val y2dq = Array.tabulate(16) { c =>
          m.y2(c) * (if (c == 0) y2dc else y2ac)
        }
        // y2 levels are in SCAN order → place via zigzag before the WHT
        val y2raster = new Array[Int](16)
        for (c <- 0 until 16) y2raster(Vp8Tables.Zigzag(c)) = y2dq(c)
        val dcs = indepIwht(y2raster)
        for (sb <- 0 until 16) {
          val blk = new Array[Int](16)
          for (c <- 1 until 16)
            blk(Vp8Tables.Zigzag(c)) = m.y(sb)(c) * y1ac
          blk(0) = dcs(sb)
          val r = indepIdct(blk)
          val bx = (sb & 3) * 4; val by = (sb >> 2) * 4
          for (i <- 0 until 4; j <- 0 until 4) res(by + i)(bx + j) = r(4 * i + j)
        }
      }
      for (i <- 0 until 16; j <- 0 until 16)
        P(y0 + i)(x0 + j) = clamp255(pred(i)(j) + res(i)(j))
    }
    // deblock, then crop — levels and coefficient flags derived straight
    // from the fixture description rather than the engine's decode state
    val levels = mbs.map { m =>
      val base = cfg.segment match {
        case Some((_, abs)) =>
          if (abs) cfg.segmentLf(m.segId) else cfg.filterLevel + cfg.segmentLf(m.segId)
        case None => cfg.filterLevel
      }
      val clamped = math.max(0, math.min(63, base))
      cfg.refLfDeltaIntra match {
        case Some(d) => math.max(0, math.min(63, clamped + d))
        case None => clamped
      }
    }
    val hasCoeffs = mbs.map { m =>
      !m.skip && (m.y2.exists(_ != 0) ||
        m.y.exists(b => (1 until 16).exists(c => b(c) != 0)) ||
        m.u.exists(_.exists(_ != 0)) || m.v.exists(_.exists(_ != 0)))
    }
    indepLoopFilter(P, mbW, mbH, levels, hasCoeffs, cfg.sharpness, cfg.simpleFilter)
    val out = new Array[Int](w * h)
    for (i <- 0 until h; j <- 0 until w) out(i * w + j) = P(i)(j)
    out
  }

  private def engineLuma(w: Int, h: Int, mbs: Seq[Mb], cfg: FrameCfg): Array[Int] = {
    val frame = Vp8Fixture.keyframe(w, h, mbs, cfg)
    val got = Vp8.decodeKeyframe(frame, 0, frame.length)
    assert(got.isDefined, "engine failed to decode the fixture keyframe")
    val (gw, gh, luma) = got.get
    assert(gw == w && gh == h)
    luma.map(_ & 0xFF)
  }

  private def assertParity(w: Int, h: Int, mbs: Seq[Mb], cfg: FrameCfg = FrameCfg()): Unit = {
    val eng = engineLuma(w, h, mbs, cfg)
    val ind = indepLuma(w, h, mbs, cfg)
    assert(eng.length == ind.length)
    val bad = eng.indices.find(i => eng(i) != ind(i))
    assert(bad.isEmpty,
      bad.map(i => s"pixel $i (${i % w},${i / w}): engine ${eng(i)} vs independent ${ind(i)}").getOrElse(""))
  }

  // ---- unit transform laws ---------------------------------------------------

  test("inverse WHT: engine butterflies == matrix algebra on random inputs") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val in = Array.fill(16)(rnd.nextInt(4000) - 2000)
      val out = new Array[Int](16)
      Vp8.inverseWht(in, out)
      assert(out.toSeq == indepIwht(in).toSeq)
    }
  }

  test("inverse DCT: engine butterflies == 2-D transcription on random inputs") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val in = Array.fill(16)(rnd.nextInt(4000) - 2000)
      val plane = new Array[Byte](16) // 4x4 plane, stride 4, zero base
      Vp8.idctAdd(plane, 4, 0, 0, in)
      val expect = indepIdct(in).map(clamp255)
      assert(plane.map(_ & 0xFF).toSeq == expect.toSeq)
    }
  }

  // ---- full-frame parity -------------------------------------------------------

  test("flat DC keyframe: a skipped top-left MB predicts the spec's 128 everywhere") {
    val eng = engineLuma(16, 16, Seq(Mb(skip = true)), FrameCfg())
    assert(eng.forall(_ == 128))
  }

  test("single MB: Y2 DC + AC levels reconstruct exactly (vs second transcription)") {
    val y2 = new Array[Int](16); y2(0) = 3; y2(1) = -2; y2(5) = 1
    val y = Array.fill(16)(new Array[Int](16))
    y(0)(1) = 4; y(0)(2) = -1; y(3)(1) = 7; y(12)(15) = 1; y(5)(3) = -5
    assertParity(16, 16, Seq(Mb(y2 = y2, y = y)))
  }

  test("all token categories (1..6) and both signs reconstruct exactly") {
    val y = Array.fill(16)(new Array[Int](16))
    // magnitudes across every category: 1..4 direct, 5, 8, 15, 25, 50, 100, 2000
    val mags = Seq(1, -2, 3, -4, 5, -8, 15, -25, 50, -100, 2000)
    for ((v, i) <- mags.zipWithIndex) y(i)(1 + (i % 15)) = v
    val y2 = new Array[Int](16); y2(0) = 60; y2(15) = -70
    assertParity(16, 16, Seq(Mb(y2 = y2, y = y)))
  }

  test("4x2 grid: V/H/TM/DC modes chain through reconstructed neighbors; chroma tokens keep sync") {
    val rnd = new scala.util.Random(23)
    def randBlk(density: Int): Array[Int] = {
      val a = new Array[Int](16)
      for (c <- 1 until 16) if (rnd.nextInt(density) == 0) a(c) = rnd.nextInt(9) - 4
      a
    }
    val modes = Seq(
      (Vp8Tables.DcPred, Vp8Tables.VPred), (Vp8Tables.VPred, Vp8Tables.DcPred),
      (Vp8Tables.HPred, Vp8Tables.TmPred), (Vp8Tables.TmPred, Vp8Tables.HPred),
      (Vp8Tables.VPred, Vp8Tables.TmPred), (Vp8Tables.TmPred, Vp8Tables.DcPred),
      (Vp8Tables.DcPred, Vp8Tables.HPred), (Vp8Tables.HPred, Vp8Tables.VPred))
    val mbs = modes.map { case (ym, uvm) =>
      val y2 = new Array[Int](16); y2(0) = rnd.nextInt(11) - 5; y2(3) = rnd.nextInt(5) - 2
      // nonzero chroma levels so a u/v token desync would corrupt later MBs
      Mb(yMode = ym, uvMode = uvm, y2 = y2,
        y = Array.fill(16)(randBlk(3)),
        u = Array.fill(4)(randBlk(4)), v = Array.fill(4)(randBlk(4)))
    }
    assertParity(64, 32, mbs, FrameCfg(q = 33, yDcDelta = 2, y2DcDelta = -1,
      y2AcDelta = 3, uvDcDelta = -2, uvAcDelta = 1))
  }

  test("non-MB-aligned crop: 50x38 decodes the declared dimensions") {
    val mbs = (0 until 12).map(i => Mb(yMode = i % 4))
    assertParity(50, 38, mbs)
  }

  test("segmentation: per-segment quantizers (absolute mode) apply per MB") {
    val y = Array.fill(16)(new Array[Int](16)); y(0)(1) = 10; y(7)(2) = -6
    val mbs = Seq(
      Mb(segId = 0, y = y.map(_.clone())),
      Mb(segId = 2, y = y.map(_.clone())),
      Mb(segId = 1, yMode = Vp8Tables.VPred, y = y.map(_.clone())),
      Mb(segId = 3, yMode = Vp8Tables.HPred, y = y.map(_.clone())))
    val cfg = FrameCfg(q = 40, segment = Some((Array(10, 60, 100, 127), true)))
    assertParity(64, 16, mbs, cfg)
    // different segments must actually produce different pixels
    val eng = engineLuma(64, 16, mbs, cfg)
    val mb0 = eng(1); val mb1 = eng(17)
    assert(mb0 != mb1, "segment quantizers had no effect")
  }

  test("two token partitions: rows alternate partitions and still reconstruct") {
    val rnd = new scala.util.Random(31)
    val mbs = (0 until 8).map { i =>
      val y2 = new Array[Int](16); y2(0) = rnd.nextInt(7) - 3
      val y = Array.fill(16) {
        val a = new Array[Int](16); a(1 + rnd.nextInt(15)) = rnd.nextInt(5) - 2; a
      }
      Mb(yMode = i % 4, y2 = y2, y = y)
    }
    assertParity(32, 64, mbs, FrameCfg(nPartsLog2 = 1))
  }

  test("skip MBs interleaved with coded MBs; and a no-skip-flag stream") {
    val y = Array.fill(16)(new Array[Int](16)); y(2)(1) = 12
    val mbs = Seq(Mb(skip = true), Mb(y = y.map(_.clone())),
      Mb(skip = true, yMode = Vp8Tables.TmPred), Mb(yMode = Vp8Tables.VPred, y = y.map(_.clone())))
    assertParity(64, 16, mbs)
    // mbNoCoeffSkip = false: no per-MB skip flags on the wire
    val mbs2 = mbs.map(_.copy(skip = false))
    assertParity(64, 16, mbs2, FrameCfg(mbNoCoeffSkip = false))
  }

  // ---- degrade contract ---------------------------------------------------------

  // ---- loop filter parity ----------------------------------------------------

  /** 4x2 grid with per-MB DC steps and residual texture — enough edge
    * activity that every filter branch (mask pass/fail, hev, taper) is
    * exercised at the chosen level.
    */
  private def texturedMbs(seed: Int): Seq[Mb] = {
    val rnd = new scala.util.Random(seed)
    (0 until 8).map { i =>
      val y2 = new Array[Int](16)
      y2(0) = Seq(0, 10, -8, 25, 3, -20, 14, 6)(i) // DC steps across MB edges
      y2(2) = rnd.nextInt(5) - 2
      val y = Array.fill(16) {
        val a = new Array[Int](16)
        a(1 + rnd.nextInt(15)) = rnd.nextInt(7) - 3
        if (rnd.nextBoolean()) a(1 + rnd.nextInt(15)) = rnd.nextInt(5) - 2
        a
      }
      Mb(yMode = i % 4, y2 = y2, y = y)
    }
  }

  test("loop filter: parity across hev regimes (levels 5 / 20 / 45)") {
    for ((level, seed) <- Seq((5, 41), (20, 42), (45, 43)))
      assertParity(64, 32, texturedMbs(seed), FrameCfg(q = 25, filterLevel = level))
  }

  test("loop filter: sharpness shrinks the interior limit; simple filter type") {
    assertParity(64, 32, texturedMbs(51), FrameCfg(q = 25, filterLevel = 30, sharpness = 3))
    assertParity(64, 32, texturedMbs(52), FrameCfg(q = 25, filterLevel = 30, sharpness = 7))
    assertParity(64, 32, texturedMbs(53),
      FrameCfg(q = 25, filterLevel = 25, simpleFilter = true))
  }

  test("loop filter: intra ref delta and per-segment levels adjust per MB") {
    assertParity(64, 32, texturedMbs(61),
      FrameCfg(q = 25, filterLevel = 18, refLfDeltaIntra = Some(14)))
    val mbs = texturedMbs(62).zipWithIndex.map { case (m, i) => m.copy(segId = i % 4) }
    assertParity(64, 32, mbs, FrameCfg(q = 30, filterLevel = 20,
      segment = Some((Array(30, 30, 30, 30), true)),
      segmentLf = Array(0, 15, 40, 63)))
  }

  test("loop filter: skipped/empty MBs keep their internal edges unfiltered") {
    val y = Array.fill(16)(new Array[Int](16)); y(5)(1) = 9
    val mbs = Seq(
      Mb(skip = true), Mb(y2 = { val a = new Array[Int](16); a(0) = 18; a }),
      Mb(), // coded but empty: every block EOBs immediately
      Mb(yMode = Vp8Tables.VPred, y = y))
    assertParity(64, 16, mbs, FrameCfg(q = 25, filterLevel = 35))
    // and the filter must actually do something on this fixture
    val filtered = engineLuma(64, 16, mbs, FrameCfg(q = 25, filterLevel = 35))
    val unfiltered = engineLuma(64, 16, mbs, FrameCfg(q = 25, filterLevel = 0))
    assert(filtered.toSeq != unfiltered.toSeq, "level-35 filter was a no-op")
  }

  // ---- degrade contract ---------------------------------------------------------

  test("degrade: inter frame, B_PRED, truncation → None; filtered frames decode") {
    val inter = Vp8Fixture.interFrame()
    assert(Vp8.decodeKeyframe(inter, 0, inter.length).isEmpty)
    val bpred = Vp8Fixture.keyframe(16, 16, Seq(Mb(yMode = Vp8Tables.BPred)))
    assert(Vp8.decodeKeyframe(bpred, 0, bpred.length).isEmpty)
    val filtered = Vp8Fixture.keyframe(16, 16, Seq(Mb()), FrameCfg(filterLevel = 12))
    assert(Vp8.decodeKeyframe(filtered, 0, filtered.length).isDefined)
    val ok = Vp8Fixture.keyframe(16, 16, Seq(Mb()))
    assert(Vp8.decodeKeyframe(ok, 0, ok.length).isDefined)
    assert(Vp8.decodeKeyframe(ok, 0, 8).isEmpty)
    assert(Vp8.decodeKeyframe(ok.take(12), 0, 12).isEmpty)
  }

  test("degrade: foreign codec id and laced blocks → None; VP8 id decodes") {
    val frame = Vp8Fixture.keyframe(16, 16, Seq(Mb(skip = true)))
    assert(Vp8.decodeFrame(Vp8Fixture.webm(Seq(frame)), 0).isDefined)
    assert(Vp8.decodeFrame(Vp8Fixture.webm(Seq(frame), codecId = "V_VP9"), 0).isEmpty)
    // hand-lace the block: flags 0x02 (Xiph), 2 lace frames
    val laced = {
      def be(v: Long, n: Int) = (0 until n).map(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte).toArray
      def vs(n: Int) = Array((0x80 | n).toByte)
      def el(id: Array[Byte], p: Array[Byte]*): Array[Byte] = {
        val pp = p.flatten.toArray; id ++ vs(pp.length) ++ pp
      }
      val hdr = el(Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte),
        el(Array(0x42, 0x82).map(_.toByte), "webm".getBytes))
      val tracks = el(Array(0x16, 0x54, 0xAE, 0x6B).map(_.toByte),
        el(Array(0xAE).map(_.toByte), el(Array(0xD7).map(_.toByte), be(1, 1)),
          el(Array(0x83).map(_.toByte), be(1, 1)),
          el(Array(0x86).map(_.toByte), "V_VP8".getBytes)))
      val block = el(Array(0xA3).map(_.toByte), Array(0x81.toByte), be(0, 2),
        Array(0x02.toByte), Array(1.toByte), Array[Byte](4), Array[Byte](1, 2, 3, 4, 5, 6))
      val cluster = el(Array(0x1F, 0x43, 0xB6, 0x75).map(_.toByte),
        el(Array(0xE7).map(_.toByte), be(0, 1)), block)
      hdr ++ el(Array(0x18, 0x53, 0x80, 0x67).map(_.toByte), tracks, cluster)
    }
    assert(Vp8.decodeFrame(laced, 0).isEmpty)
    assert(Vp8.decodeFrame(laced, 1).isEmpty)
  }

  test("WebP: a lossy still image decodes through the VP8 keyframe path") {
    val y = Array.fill(16)(new Array[Int](16)); y(4)(1) = 15
    val frame = Vp8Fixture.keyframe(32, 16,
      Seq(Mb(y = y.map(_.clone())), Mb(yMode = Vp8Tables.HPred)),
      FrameCfg(filterLevel = 10))
    // pixels through the image entry == pixels through the raw keyframe
    val direct = Vp8.decodeKeyframe(frame, 0, frame.length).get
    val viaWebp = Vp8.decodeWebP(Vp8Fixture.webp(frame)).get
    assert(viaWebp._1 == direct._1 && viaWebp._2 == direct._2)
    assert(viaWebp._3.toSeq == direct._3.toSeq)
    // routed through the image feature path
    val Some((w, h, grid)) = Multimodal.decodeImage(Vp8Fixture.webp(frame))
    assert(w == 32 && h == 16 && grid.length == Multimodal.FeatureDim)
    // a chunk before VP8 ' is skipped with RIFF padding honored
    val withLeading = {
      val odd = Array[Byte](1, 2, 3) // odd-size chunk forces the pad rule
      val le = (v: Int) => Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      val junkChunk = "JUNK".getBytes("ISO-8859-1") ++ le(odd.length) ++ odd ++ Array[Byte](0)
      val vp8Chunk = "VP8 ".getBytes("ISO-8859-1") ++ le(frame.length) ++ frame
      "RIFF".getBytes("ISO-8859-1") ++ le(4 + junkChunk.length + vp8Chunk.length) ++
        "WEBP".getBytes("ISO-8859-1") ++ junkChunk ++ vp8Chunk
    }
    assert(Vp8.decodeWebP(withLeading).get._3.toSeq == direct._3.toSeq)
    // honest degrades: lossless and extended chunk types, junk bytes
    assert(Vp8.decodeWebP(Vp8Fixture.webp(frame, chunkTag = "VP8L")).isEmpty)
    assert(Vp8.decodeWebP(Vp8Fixture.webp(frame, chunkTag = "VP8X")).isEmpty)
    assert(Vp8.decodeWebP("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Vp8.decodeWebP(null).isEmpty)
  }

  test("fuzz: random and bit-flipped payloads never throw — degrade only") {
    val rnd = new scala.util.Random(977)
    // pure garbage at several sizes
    for (sz <- Seq(0, 1, 9, 64, 513, 4096)) {
      val junk = Array.fill(sz)(rnd.nextInt(256).toByte)
      Vp8.decodeFrame(junk, 0)
      Vp8.decodeKeyframe(junk, 0, junk.length)
      Multimodal.decodeVideoFrame(junk, 0)
    }
    // a valid container with single random byte corruptions — every
    // outcome (None, or a successfully decoded frame when the flip lands
    // in a don't-care byte) is fine; an escaped exception is not
    val y = Array.fill(16)(new Array[Int](16)); y(3)(2) = 11
    val good = Vp8Fixture.webm(Seq(
      Vp8Fixture.keyframe(32, 16, Seq(Mb(y = y.map(_.clone())), Mb(yMode = Vp8Tables.VPred)),
        FrameCfg(filterLevel = 20))))
    for (_ <- 0 until 300) {
      val mutated = good.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      Multimodal.decodeVideoFrame(mutated, 0)
    }
    // truncations at every length decile
    for (k <- 1 until 10) {
      val cut = good.take(good.length * k / 10)
      Multimodal.decodeVideoFrame(cut, 0)
    }
  }

  // ---- container routing ----------------------------------------------------------

  test("frame indexes align between webmFrameIndex and decodeFrame") {
    val f0 = Vp8Fixture.keyframe(16, 16, Seq(Mb(skip = true))) // flat 128
    val y = Array.fill(16)(new Array[Int](16)); y(0)(1) = 20
    val f1 = Vp8Fixture.keyframe(16, 16, Seq(Mb(y = y)))
    val container = Vp8Fixture.webm(Seq(f0, f1))
    val Some((_, starts)) = Multimodal.videoFrameIndex(container)
    assert(starts.toSeq == Seq(0L, 40L))
    val d0 = Vp8.decodeFrame(container, 0).get._3.map(_ & 0xFF)
    val d1 = Vp8.decodeFrame(container, 1).get._3.map(_ & 0xFF)
    assert(d0.forall(_ == 128))
    assert(d1.toSeq != d0.toSeq, "frame 1 must decode its own (non-flat) pixels")
    assert(Vp8.decodeFrame(container, 2).isEmpty)
  }

  test("frameDecoder (demux-once) ≡ decodeFrame per index; features = mean of per-frame grids") {
    val y = Array.fill(16)(new Array[Int](16)); y(0)(1) = 20; y(9)(5) = -7
    val frames = Seq(
      Vp8Fixture.keyframe(16, 16, Seq(Mb(skip = true))),
      Vp8Fixture.keyframe(16, 16, Seq(Mb(y = y))),
      Vp8Fixture.keyframe(16, 16, Seq(Mb(yMode = Vp8Tables.TmPred))))
    val container = Vp8Fixture.webm(frames)
    val Some((cnt, dec)) = Vp8.frameDecoder(container)
    assert(cnt == 3)
    for (i <- -1 to 3) {
      val a = dec(i).map { case (w, h, l) => (w, h, l.toSeq) }
      val b = Vp8.decodeFrame(container, i).map { case (w, h, l) => (w, h, l.toSeq) }
      assert(a == b, s"frame $i")
    }
    // extractVideoFeatures (single-demux path) must equal the mean of
    // the per-frame decodeVideoFrame grids
    val perFrame = (0 until 3).map(i => Multimodal.decodeVideoFrame(container, i).get._3)
    val expect = Array.tabulate(Multimodal.FeatureDim)(d =>
      (perFrame.map(_(d).toDouble).sum / 3).toFloat)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, container, Row("vid", 16, 16, 0L)))),
      Multimodal.MediaSchema)
    val got = Multimodal.extractVideoFeatures(df).collect()(0)
    assert(got.getAs[Int]("n_frames") == 3 && got.getAs[Boolean]("decoded"))
    assert(got.getAs[Seq[Float]]("features").toArray.toSeq == expect.toSeq)
  }

  test("decodeVideoFrame routes WebM/VP8 to real pixels; extractVideoFeatures reports decoded") {
    val frame = Vp8Fixture.keyframe(32, 32, Seq.fill(4)(Mb(skip = true)))
    val container = Vp8Fixture.webm(Seq(frame))
    val Some((w, h, grid)) = Multimodal.decodeVideoFrame(container, 0)
    assert(w == 32 && h == 32)
    assert(grid.length == Multimodal.FeatureDim)
    assert(grid.forall(_ == 128.0f), "flat DC frame must pool to 128 everywhere")
    val rows = Seq(Row(1L, container, Row("vid", 32, 32, 0L)),
      Row(2L, "not a container".getBytes, Row("vid", 0, 0, 0L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val got = Multimodal.extractVideoFeatures(df).orderBy("media_id").collect()
    assert(got(0).getAs[Boolean]("decoded") && got(0).getAs[Int]("n_frames") == 1)
    assert(!got(1).getAs[Boolean]("decoded"))
  }
}
