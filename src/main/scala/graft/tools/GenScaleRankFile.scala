package graft.tools

import java.nio.file.{Files, Paths}
import graft.expressions.BpeOps

/** Generates a PUBLISHED-SIZE tiktoken rank file (~200k entries, the
  * o200k_base scale) for the env-gated real-scale tokenizer validation in
  * TiktokenSpec — the real o200k_base.tiktoken is unavailable offline, so
  * this builds a structurally faithful stand-in:
  *
  *  - ranks 0–255 are the single bytes (required by
  *    [[BpeOps.RankTokenizer]] — every input stays encodable);
  *  - every multi-byte token is an EARLIER-RANKED token plus one byte
  *    (prefix-closed, like a trained BPE vocabulary), so the rank-based
  *    merge loop genuinely fires at every step of a token's growth
  *    rather than degenerating to byte fallback;
  *  - token material is drawn from a fixed xorshift stream over a
  *    letter-heavy alphabet with realistic word-length distribution
  *    (2–16 bytes), fully deterministic — same file every run.
  *
  * NOT committed (≈4 MB of derived data): regenerate on demand with
  *
  *   sbt "runMain graft.tools.GenScaleRankFile target/scale_rankfile.tiktoken"
  *
  * then run the gated spec with
  * `GRAFT_SCALE_RANKFILE=target/scale_rankfile.tiktoken sbt "testOnly graft.TiktokenSpec"`.
  */
object GenScaleRankFile {

  val Entries = 200000 // o200k_base's published size is 199,998 + 2 specials

  /** Deterministic xorshift64* — no java.util.Random so the stream is
    * pinned across JVM versions.
    */
  private final class XorShift(seed0: Long) {
    private var s = seed0
    def next(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
    def nextInt(bound: Int): Int = {
      val v = (next() >>> 33).toInt
      v % bound
    }
  }

  /** The full entry table: 256 single bytes + prefix-closed words. */
  def entries(total: Int = Entries): Vector[(Array[Byte], Int)] = {
    val alphabet = "etaoinshrdlucmfwypvbgkjqxz".getBytes("US-ASCII")
    val rng = new XorShift(0x6f323030L) // "o200"
    val seen = new java.util.HashSet[String]()
    val out = Vector.newBuilder[(Array[Byte], Int)]
    var rank = 0
    (0 until 256).foreach { b =>
      out += ((Array(b.toByte), rank))
      seen.add(b.toChar.toString)
      rank += 1
    }
    // words (some space-prefixed, like real BPE vocabularies) emitted as
    // their full prefix chains: " qu", " que", " quez", ... — each new
    // token = an already-present token + 1 byte
    while (rank < total) {
      val len = 2 + rng.nextInt(15)
      val spaced = rng.nextInt(100) < 60 // o200k is dominated by " word" tokens
      val sb = new java.lang.StringBuilder(len + 1)
      if (spaced) sb.append(' ')
      var i = 0
      while (i < len) { sb.append(alphabet(rng.nextInt(alphabet.length)).toChar); i += 1 }
      val word = sb.toString
      // add every prefix of length >= 2 not yet present, shortest first
      var p = 2
      while (p <= word.length && rank < total) {
        val pref = word.substring(0, p)
        if (seen.add(pref)) {
          out += ((pref.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), rank))
          rank += 1
        }
        p += 1
      }
    }
    out.result()
  }

  /** Generate the full table and write it as a .tiktoken rank file —
    * callable from tests (TiktokenSpec generates it on demand so the
    * full-scale path runs in every `sbt test`, no env gate).
    */
  def write(out: java.nio.file.Path): Unit = {
    if (out.getParent != null) Files.createDirectories(out.getParent)
    Files.writeString(out, BpeOps.renderTiktoken(entries()))
  }

  def main(args: Array[String]): Unit = {
    val out = Paths.get(args.headOption.getOrElse("target/scale_rankfile.tiktoken"))
    val t0 = System.nanoTime()
    write(out)
    println(s"[fixtures] wrote $out: ${Entries} entries in " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
