package graft.multimodal

/** CAVLC residual-block decoding (ITU-T H.264 / ISO/IEC 14496-10 §9.2) —
  * the entropy coding every real baseline-profile encoder emits for
  * I-frame residuals (I_PCM, the previous decode boundary, is a
  * conformance mode no production encoder uses).
  *
  * The VLC tables are transcribed from the published spec: coeff_token
  * Table 9-5 (four nC classes + the chroma-DC class), total_zeros
  * Tables 9-7/9-8 (4x4) and 9-9(a) (chroma DC), run_before Table 9-10.
  * No independent H.264 encoder exists in this environment to
  * cross-validate the transcription, so the specs pin what CAN be pinned
  * without one: every table is prefix-free and complete (PropertySpec-
  * style structural check), encode→decode round-trips every symbol, and
  * the published worked example of a CAVLC block decode (the standard
  * textbook vector for TotalCoeff 5 / T1s 3 / total_zeros 3) reproduces
  * bit-exactly.
  */
private[graft] object Cavlc {

  /** One VLC: (bits-as-string → symbol). Decoding walks bit-by-bit until
    * a codeword matches — max codeword length is 16, so the walk is
    * bounded; prefix-freeness (spec-checked) makes the first match THE
    * match.
    */
  final class Vlc(entries: Seq[(String, Int)]) {
    val byCode: Map[String, Int] = entries.toMap
    val bySymbol: Map[Int, String] = entries.map(_.swap).toMap
    require(byCode.size == entries.size, "duplicate codewords")
    require(bySymbol.size == entries.size, "duplicate symbols")
    val maxLen: Int = entries.map(_._1.length).max

    def read(r: H264.BitReader): Int = {
      val sb = new StringBuilder
      while (sb.length <= maxLen) {
        sb.append(if (r.u1() == 1) '1' else '0')
        byCode.get(sb.toString) match {
          case Some(v) => return v
          case None => ()
        }
      }
      throw new IllegalStateException(s"no VLC codeword matches: $sb")
    }
  }

  /** coeff_token symbol packing: (TrailingOnes << 5) | TotalCoeff. */
  @inline def token(t1: Int, tc: Int): Int = (t1 << 5) | tc
  @inline def trailingOnes(sym: Int): Int = sym >> 5
  @inline def totalCoeff(sym: Int): Int = sym & 31

  private def tok(rows: Seq[(Int, Int, String)]): Vlc =
    new Vlc(rows.map { case (t1, tc, code) => code -> token(t1, tc) })

  /** Table 9-5, column 0 <= nC < 2. */
  val CoeffToken0: Vlc = tok(Seq(
    (0, 0, "1"),
    (0, 1, "000101"), (1, 1, "01"),
    (0, 2, "00000111"), (1, 2, "000100"), (2, 2, "001"),
    (0, 3, "000000111"), (1, 3, "00000110"), (2, 3, "0000101"), (3, 3, "00011"),
    (0, 4, "0000000111"), (1, 4, "000000110"), (2, 4, "00000101"), (3, 4, "000011"),
    (0, 5, "00000000111"), (1, 5, "0000000110"), (2, 5, "000000101"), (3, 5, "0000100"),
    (0, 6, "0000000001111"), (1, 6, "00000000110"), (2, 6, "0000000101"), (3, 6, "00000100"),
    (0, 7, "0000000001011"), (1, 7, "0000000001110"), (2, 7, "00000000101"), (3, 7, "000000100"),
    (0, 8, "0000000001000"), (1, 8, "0000000001010"), (2, 8, "0000000001101"), (3, 8, "0000000100"),
    (0, 9, "00000000001111"), (1, 9, "00000000001110"), (2, 9, "0000000001001"), (3, 9, "00000000100"),
    (0, 10, "00000000001011"), (1, 10, "00000000001010"), (2, 10, "00000000001101"), (3, 10, "0000000001100"),
    (0, 11, "000000000001111"), (1, 11, "000000000001110"), (2, 11, "00000000001001"), (3, 11, "00000000001100"),
    (0, 12, "000000000001011"), (1, 12, "000000000001010"), (2, 12, "000000000001101"), (3, 12, "00000000001000"),
    (0, 13, "0000000000001111"), (1, 13, "000000000000001"), (2, 13, "000000000001001"), (3, 13, "000000000001100"),
    (0, 14, "0000000000001011"), (1, 14, "0000000000001110"), (2, 14, "0000000000001101"), (3, 14, "000000000001000"),
    (0, 15, "0000000000000111"), (1, 15, "0000000000001010"), (2, 15, "0000000000001001"), (3, 15, "0000000000001100"),
    (0, 16, "0000000000000100"), (1, 16, "0000000000000110"), (2, 16, "0000000000000101"), (3, 16, "0000000000001000")))

  /** Table 9-5, column 2 <= nC < 4. */
  val CoeffToken1: Vlc = tok(Seq(
    (0, 0, "11"),
    (0, 1, "001011"), (1, 1, "10"),
    (0, 2, "000111"), (1, 2, "00111"), (2, 2, "011"),
    (0, 3, "0000111"), (1, 3, "001010"), (2, 3, "001001"), (3, 3, "0101"),
    (0, 4, "00000111"), (1, 4, "000110"), (2, 4, "000101"), (3, 4, "0100"),
    (0, 5, "00000100"), (1, 5, "0000110"), (2, 5, "0000101"), (3, 5, "00110"),
    (0, 6, "000000111"), (1, 6, "00000110"), (2, 6, "00000101"), (3, 6, "001000"),
    (0, 7, "00000001111"), (1, 7, "000000110"), (2, 7, "000000101"), (3, 7, "000100"),
    (0, 8, "00000001011"), (1, 8, "00000001110"), (2, 8, "00000001101"), (3, 8, "0000100"),
    (0, 9, "000000001111"), (1, 9, "00000001010"), (2, 9, "00000001001"), (3, 9, "000000100"),
    (0, 10, "000000001011"), (1, 10, "000000001110"), (2, 10, "000000001101"), (3, 10, "00000001100"),
    (0, 11, "000000001000"), (1, 11, "000000001010"), (2, 11, "000000001001"), (3, 11, "00000001000"),
    (0, 12, "0000000001111"), (1, 12, "0000000001110"), (2, 12, "0000000001101"), (3, 12, "000000001100"),
    (0, 13, "0000000001011"), (1, 13, "0000000001010"), (2, 13, "0000000001001"), (3, 13, "0000000001100"),
    (0, 14, "0000000000111"), (1, 14, "00000000001011"), (2, 14, "0000000000110"), (3, 14, "0000000001000"),
    (0, 15, "00000000001001"), (1, 15, "00000000001000"), (2, 15, "00000000001010"), (3, 15, "0000000000001"),
    (0, 16, "00000000000111"), (1, 16, "00000000000110"), (2, 16, "00000000000101"), (3, 16, "00000000000100")))

  /** Table 9-5, column 4 <= nC < 8. */
  val CoeffToken2: Vlc = tok(Seq(
    (0, 0, "1111"),
    (0, 1, "001111"), (1, 1, "1110"),
    (0, 2, "001011"), (1, 2, "01111"), (2, 2, "1101"),
    (0, 3, "001000"), (1, 3, "01100"), (2, 3, "01110"), (3, 3, "1100"),
    (0, 4, "0001111"), (1, 4, "01010"), (2, 4, "01011"), (3, 4, "1011"),
    (0, 5, "0001011"), (1, 5, "01000"), (2, 5, "01001"), (3, 5, "1010"),
    (0, 6, "0001001"), (1, 6, "001110"), (2, 6, "001101"), (3, 6, "1001"),
    (0, 7, "0001000"), (1, 7, "001010"), (2, 7, "001001"), (3, 7, "1000"),
    (0, 8, "00001111"), (1, 8, "0001110"), (2, 8, "0001101"), (3, 8, "01101"),
    (0, 9, "00001011"), (1, 9, "00001110"), (2, 9, "0001010"), (3, 9, "001100"),
    (0, 10, "000001111"), (1, 10, "00001010"), (2, 10, "00001101"), (3, 10, "0001100"),
    (0, 11, "000001011"), (1, 11, "000001110"), (2, 11, "00001001"), (3, 11, "00001100"),
    (0, 12, "000001000"), (1, 12, "000001010"), (2, 12, "000001001"), (3, 12, "00001000"),
    (0, 13, "0000001101"), (1, 13, "000000111"), (2, 13, "000001101"), (3, 13, "000001100"),
    (0, 14, "0000001001"), (1, 14, "0000001100"), (2, 14, "0000001011"), (3, 14, "0000001010"),
    (0, 15, "0000000101"), (1, 15, "0000001000"), (2, 15, "0000000111"), (3, 15, "0000000110"),
    (0, 16, "0000000001"), (1, 16, "0000000100"), (2, 16, "0000000011"), (3, 16, "0000000010")))

  /** Table 9-5, chroma-DC column (nC == -1, 4:2:0). */
  val CoeffTokenChromaDc: Vlc = tok(Seq(
    (0, 0, "01"),
    (0, 1, "000111"), (1, 1, "1"),
    (0, 2, "000100"), (1, 2, "000110"), (2, 2, "001"),
    (0, 3, "000011"), (1, 3, "0000011"), (2, 3, "0000010"), (3, 3, "000101"),
    (0, 4, "000010"), (1, 4, "00000011"), (2, 4, "00000010"), (3, 4, "0000000")))

  /** coeff_token for nC >= 8: 6-bit FLC (§9.2.1) — TotalCoeff 0 / T1 0 is
    * the reserved 000011 codeword; everything else codes
    * xxxx = TotalCoeff - 1, yy = TrailingOnes.
    */
  def readCoeffTokenFlc(r: H264.BitReader): Int = {
    val v = r.u(6)
    if (v == 3) token(0, 0)
    else token(v & 3, (v >> 2) + 1)
  }

  def writeCoeffTokenFlc(t1: Int, tc: Int): String = {
    val v = if (tc == 0) 3 else ((tc - 1) << 2) | t1
    (0 until 6).map(i => (v >> (5 - i)) & 1).mkString
  }

  /** total_zeros, 4x4 blocks (Tables 9-7 and 9-8), indexed by
    * TotalCoeff 1..15; symbol = totalZeros.
    */
  val TotalZeros4x4: Array[Vlc] = {
    def v(codes: String*): Vlc = new Vlc(codes.zipWithIndex)
    Array(
      null, // TotalCoeff 0 never reads total_zeros
      v("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
        "000000010", "000000001"),
      v("111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"),
      v("0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"),
      v("00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"),
      v("0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"),
      v("000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
        "001", "000000"),
      v("000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"),
      v("000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"),
      v("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
      v("00001", "00000", "001", "11", "10", "01", "0001"),
      v("0000", "0001", "001", "010", "1", "011"),
      v("0000", "0001", "01", "1", "001"),
      v("000", "001", "1", "01"),
      v("00", "01", "1"),
      v("0", "1"))
  }

  /** total_zeros, chroma-DC 2x2 blocks (Table 9-9(a), maxNumCoeff 4),
    * indexed by TotalCoeff 1..3.
    */
  val TotalZerosChromaDc: Array[Vlc] = Array(
    null,
    new Vlc(Seq("1", "01", "001", "000").zipWithIndex),
    new Vlc(Seq("1", "01", "00").zipWithIndex),
    new Vlc(Seq("1", "0").zipWithIndex))

  /** run_before (Table 9-10), indexed by min(zerosLeft, 7); the >6 column
    * extends with one-more-zero codewords up to run 14.
    */
  val RunBefore: Array[Vlc] = {
    def v(codes: String*): Vlc = new Vlc(codes.zipWithIndex)
    Array(
      null, // zerosLeft 0 never reads run_before
      v("1", "0"),
      v("1", "01", "00"),
      v("11", "10", "01", "00"),
      v("11", "10", "01", "001", "000"),
      v("11", "10", "011", "010", "001", "000"),
      v("11", "000", "001", "011", "010", "101", "100"),
      v("111", "110", "101", "100", "011", "010", "001", "0001", "00001",
        "000001", "0000001", "00000001", "000000001", "0000000001",
        "00000000001"))
  }

  /** Decoded residual block: levels in scan order (index 0 = the
    * lowest-frequency coefficient of THIS block's scan) plus the
    * TotalCoeff the neighbor-nC bookkeeping needs.
    */
  final case class Block(levels: Array[Int], totalCoeff: Int)

  private def coeffTokenVlc(nC: Int): Vlc =
    if (nC == -1) CoeffTokenChromaDc
    else if (nC < 2) CoeffToken0
    else if (nC < 4) CoeffToken1
    else CoeffToken2

  /** residual_block_cavlc (§9.2): reads one block of `maxNumCoeff`
    * coefficients with VLC class selected by `nC` (-1 = chroma DC).
    */
  def readBlock(r: H264.BitReader, nC: Int, maxNumCoeff: Int): Block = {
    val sym =
      if (nC >= 8) readCoeffTokenFlc(r)
      else coeffTokenVlc(nC).read(r)
    val tc = totalCoeff(sym)
    val t1 = trailingOnes(sym)
    val levels = new Array[Int](maxNumCoeff)
    if (tc == 0) return Block(levels, 0)

    // levels, highest frequency first (§9.2.2)
    val levelVal = new Array[Int](tc)
    var suffixLength = if (tc > 10 && t1 < 3) 1 else 0
    var i = 0
    while (i < tc) {
      if (i < t1) levelVal(i) = 1 - 2 * r.u1()
      else {
        var levelPrefix = 0
        while (r.u1() == 0) {
          levelPrefix += 1
          if (levelPrefix > 31) throw new IllegalStateException("level_prefix")
        }
        var levelCode = math.min(15, levelPrefix) << suffixLength
        if (suffixLength > 0 || levelPrefix >= 14) {
          val levelSuffixSize =
            if (levelPrefix == 14 && suffixLength == 0) 4
            else if (levelPrefix >= 15) levelPrefix - 3
            else suffixLength
          levelCode += r.u(levelSuffixSize)
        }
        if (levelPrefix >= 15 && suffixLength == 0) levelCode += 15
        if (levelPrefix >= 16) levelCode += (1 << (levelPrefix - 3)) - 4096
        if (i == t1 && t1 < 3) levelCode += 2
        levelVal(i) =
          if (levelCode % 2 == 0) (levelCode + 2) >> 1
          else (-levelCode - 1) >> 1
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(levelVal(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
          suffixLength += 1
      }
      i += 1
    }

    // total_zeros + run_before (§9.2.3)
    var zerosLeft =
      if (tc == maxNumCoeff) 0
      else if (nC == -1) TotalZerosChromaDc(tc).read(r)
      else TotalZeros4x4(tc).read(r)
    val runVal = new Array[Int](tc)
    i = 0
    while (i < tc - 1) {
      runVal(i) = if (zerosLeft > 0) RunBefore(math.min(zerosLeft, 7)).read(r)
                  else 0
      zerosLeft -= runVal(i)
      if (zerosLeft < 0) throw new IllegalStateException("run_before underrun")
      i += 1
    }
    runVal(tc - 1) = zerosLeft

    var coeffNum = -1
    i = tc - 1
    while (i >= 0) {
      coeffNum += runVal(i) + 1
      levels(coeffNum) = levelVal(i)
      i -= 1
    }
    Block(levels, tc)
  }
}
