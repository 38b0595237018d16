package graft

/** In-memory FLAC fixture encoder for the multimodal audio specs: real
  * RFC 9639 streams built from chosen samples — CONSTANT / VERBATIM /
  * FIXED / LPC subframes, Rice partitions with escapes, wasted bits,
  * stereo decorrelation modes — with a correct STREAMINFO MD5, so the
  * engine's own MD5 gate cross-checks every decoded sample. CRC-8/16
  * here are INDEPENDENT table-driven transcriptions (the engine's are
  * bitwise loops); both are pinned to the published check values in
  * FlacSpec, so encoder/decoder agreement isn't self-confirmation.
  */
object FlacFixture {

  // ---- bit writer (MSB-first) ---------------------------------------------

  final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nBits = 0
    def u1(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { buf += cur.toByte; cur = 0; nBits = 0 }
    }
    def u(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { u1(((v >> i) & 1).toInt); i -= 1 }
    }
    /** Signed value in n bits (two's complement truncation). */
    def s(v: Int, n: Int): Unit = u(v.toLong & ((1L << n) - 1), n)
    def unary(q: Int): Unit = { var i = 0; while (i < q) { u1(0); i += 1 }; u1(1) }
    def align0(): Unit = while (nBits != 0) u1(0)
    def bytes: Array[Byte] = { require(nBits == 0, "unaligned"); buf.toArray }
    def lengthBytes: Int = { require(nBits == 0); buf.length }
  }

  // ---- independent table-driven CRCs ---------------------------------------

  private val Crc8Table: Array[Int] = Array.tabulate(256) { b =>
    var crc = b
    var k = 0
    while (k < 8) {
      crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF else (crc << 1) & 0xFF
      k += 1
    }
    crc
  }

  private val Crc16Table: Array[Int] = Array.tabulate(256) { b =>
    var crc = b << 8
    var k = 0
    while (k < 8) {
      crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
      else (crc << 1) & 0xFFFF
      k += 1
    }
    crc
  }

  def crc8(b: Array[Byte]): Int = {
    var crc = 0
    for (x <- b) crc = Crc8Table(crc ^ (x & 0xFF))
    crc
  }

  def crc16(b: Array[Byte]): Int = {
    var crc = 0
    for (x <- b) crc = Crc16Table(((crc >> 8) ^ (x & 0xFF)) & 0xFF) ^ ((crc << 8) & 0xFFFF)
    crc
  }

  // ---- subframe descriptions ------------------------------------------------

  sealed trait Sub
  /** All samples equal (encoder asserts). */
  case object Constant extends Sub
  case object Verbatim extends Sub
  /** Fixed predictor of the given order, one Rice parameter. */
  final case class Fixed(order: Int, riceParam: Int = 4,
                         partOrder: Int = 0, escapeBits: Option[Int] = None) extends Sub
  /** Quantized LPC with explicit coefficients and shift. */
  final case class Lpc(coefs: Array[Int], shift: Int, precision: Int,
                       riceParam: Int = 4) extends Sub

  /** One frame: per-channel samples (post-decorrelation domain is
    * handled by the encoder), subframe plan per channel, optional
    * wasted bits per channel (samples must already be multiples of
    * 2^wasted).
    */
  final case class Frame(samples: Array[Array[Int]], subs: Seq[Sub],
                         wasted: Seq[Int] = Nil,
                         assignment: Int = -1) // -1 independent; 0 L/S 1 R/S 2 M/S

  // ---- residual + subframe encoding -----------------------------------------

  private def zigzag(v: Int): Long = if (v >= 0) v.toLong << 1 else (-v.toLong << 1) - 1

  private def writeRice(w: BitWriter, res: Array[Int], predOrder: Int,
                        blockSize: Int, param: Int, partOrder: Int,
                        escapeBits: Option[Int]): Unit = {
    val method = if (param > 14) 1 else 0 // 5-bit params when needed
    w.u(method, 2)
    val paramBits = if (method == 0) 4 else 5
    w.u(partOrder, 4)
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0)
    var n = 0
    for (part <- 0 until nParts) {
      val count = (blockSize >> partOrder) - (if (part == 0) predOrder else 0)
      escapeBits match {
        case Some(bits) =>
          w.u((1 << paramBits) - 1, paramBits) // escape
          w.u(bits, 5)
          for (_ <- 0 until count) { w.s(res(n), bits); n += 1 }
        case None =>
          w.u(param, paramBits)
          for (_ <- 0 until count) {
            val z = zigzag(res(n))
            w.unary((z >> param).toInt)
            if (param > 0) w.u(z & ((1L << param) - 1), param)
            n += 1
          }
      }
    }
    require(n == res.length, s"encoded $n of ${res.length} residuals")
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  private def writeSub(w: BitWriter, s: Array[Int], sub: Sub, bps: Int,
                       wasted: Int): Unit = {
    w.u1(0) // pad
    val shifted = if (wasted > 0) s.map { v =>
      require(v % (1 << wasted) == 0, "sample not a multiple of 2^wasted")
      v >> wasted
    } else s
    val effBps = bps - wasted
    def writeWasted(): Unit =
      if (wasted > 0) { w.u1(1); w.unary(wasted - 1) } else w.u1(0)
    sub match {
      case Constant =>
        require(shifted.forall(_ == shifted(0)))
        w.u(0, 6); writeWasted()
        w.s(shifted(0), effBps)
      case Verbatim =>
        w.u(1, 6); writeWasted()
        shifted.foreach(v => w.s(v, effBps))
      case Fixed(order, param, partOrder, escape) =>
        w.u(0x08 | order, 6); writeWasted()
        for (i <- 0 until order) w.s(shifted(i), effBps)
        val res = Array.tabulate(shifted.length - order) { k =>
          val i = k + order
          val coefs = FixedCoefs(order)
          var p = 0L
          for (j <- coefs.indices) p += coefs(j).toLong * shifted(i - 1 - j)
          (shifted(i) - p).toInt
        }
        writeRice(w, res, order, shifted.length, param, partOrder, escape)
      case Lpc(coefs, shift, precision, param) =>
        val order = coefs.length
        w.u(0x20 | (order - 1), 6); writeWasted()
        for (i <- 0 until order) w.s(shifted(i), effBps)
        w.u(precision - 1, 4)
        w.s(shift, 5)
        coefs.foreach(c => w.s(c, precision))
        val res = Array.tabulate(shifted.length - order) { k =>
          val i = k + order
          var acc = 0L
          for (j <- 0 until order) acc += coefs(j).toLong * shifted(i - 1 - j)
          (shifted(i) - (acc >> shift)).toInt
        }
        writeRice(w, res, order, shifted.length, param, 0, None)
    }
  }

  // ---- stream assembly --------------------------------------------------------

  /** Block-size code per the spec's table; fixture uses the explicit
    * 16-bit form unless the size has a dedicated code.
    */
  private def bsCodeOf(n: Int): (Int, Option[Int]) = n match {
    case 192 => (1, None)
    case 576 => (2, None)
    case 1152 => (3, None)
    case 256 => (8, None)
    case 4096 => (12, None)
    case _ => (7, Some(n - 1))
  }

  /** Assemble a whole stream. `bps` is the stream bit depth; frames may
    * use stereo decorrelation (assignment 0/1/2) in which case
    * `samples` are the TRUE left/right and the encoder derives the
    * stored channels. `sampleRate` must be a STREAMINFO-expressible
    * rate (frames reference STREAMINFO with code 0).
    */
  def stream(sampleRate: Int, bps: Int, frames: Seq[Frame],
             md5Valid: Boolean = true): Array[Byte] = {
    val channels = frames.head.samples.length
    val total = frames.map(_.samples(0).length.toLong).sum
    // MD5 over the true interleaved PCM, minimum whole-byte width, LE
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = (bps + 7) / 8
    for (f <- frames; i <- 0 until f.samples(0).length; c <- 0 until channels) {
      val v = f.samples(c)(i)
      md.update(Array.tabulate(bytesPer)(k => ((v >> (8 * k)) & 0xFF).toByte))
    }
    val md5 = if (md5Valid) md.digest() else new Array[Byte](16).map(_ => 0x5A.toByte)

    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "fLaC".getBytes("ISO-8859-1")
    val si = new BitWriter
    si.u1(1); si.u(0, 7); si.u(34, 24) // last block, STREAMINFO, 34 bytes
    si.u(frames.map(_.samples(0).length).min.toLong, 16)
    si.u(frames.map(_.samples(0).length).max.toLong, 16)
    si.u(0, 24); si.u(0, 24) // frame sizes unknown
    si.u(sampleRate.toLong, 20)
    si.u((channels - 1).toLong, 3)
    si.u((bps - 1).toLong, 5)
    si.u(total, 36)
    md5.foreach(b => si.u((b & 0xFF).toLong, 8))
    out ++= si.bytes

    for ((f, idx) <- frames.zipWithIndex) {
      val blockSize = f.samples(0).length
      // derive stored channels for decorrelated modes
      val stored: Array[Array[Int]] = f.assignment match {
        case -1 => f.samples
        case 0 => // left/side
          Array(f.samples(0),
            Array.tabulate(blockSize)(i => f.samples(0)(i) - f.samples(1)(i)))
        case 1 => // right/side: stored ch0 = side, ch1 = right
          Array(Array.tabulate(blockSize)(i => f.samples(0)(i) - f.samples(1)(i)),
            f.samples(1))
        case 2 => // mid/side
          Array(
            Array.tabulate(blockSize)(i => (f.samples(0)(i) + f.samples(1)(i)) >> 1),
            Array.tabulate(blockSize)(i => f.samples(0)(i) - f.samples(1)(i)))
      }
      val chAssign = f.assignment match {
        case -1 => channels - 1
        case a => 8 + a
      }
      val w = new BitWriter
      w.u(0x3FFE, 14) // sync
      w.u1(0) // reserved
      w.u1(0) // fixed blocking
      val (bsCode, bsExtra) = bsCodeOf(blockSize)
      w.u(bsCode, 4)
      w.u(0, 4) // sample rate: STREAMINFO
      w.u(chAssign, 4)
      w.u(0, 3) // sample size: STREAMINFO
      w.u1(0) // reserved
      // UTF-8-style frame number (fixture frames stay below 128)
      require(idx < 128)
      w.u(idx, 8)
      bsExtra.foreach(v => w.u(v, 16))
      val headerBytes = w.bytes
      val hcrc = crc8(headerBytes)
      val body = new BitWriter
      headerBytes.foreach(b => body.u((b & 0xFF).toLong, 8))
      body.u(hcrc, 8)
      for (c <- 0 until channels) {
        val wb = if (f.wasted.nonEmpty) f.wasted(c) else 0
        val sideBps = f.assignment match {
          case 0 if c == 1 => bps + 1
          case 1 if c == 0 => bps + 1
          case 2 if c == 1 => bps + 1
          case _ => bps
        }
        writeSub(body, stored(c), f.subs(c), sideBps, wb)
      }
      body.align0()
      val frameBytes = body.bytes
      val fcrc = crc16(frameBytes)
      out ++= frameBytes
      out += ((fcrc >> 8) & 0xFF).toByte
      out += (fcrc & 0xFF).toByte
    }
    out.toArray
  }

  /** Minimal 16-bit PCM WAV of the same interleaved samples — for the
    * FLAC-vs-WAV feature-parity law.
    */
  def wav(sampleRate: Int, chans: Array[Array[Int]]): Array[Byte] = {
    val channels = chans.length
    val n = chans(0).length
    val dataLen = n * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16); bb.putShort(1)
    bb.putShort(channels.toShort); bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2); bb.putShort((channels * 2).toShort)
    bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    for (i <- 0 until n; c <- 0 until channels) bb.putShort(chans(c)(i).toShort)
    bb.array()
  }
}
