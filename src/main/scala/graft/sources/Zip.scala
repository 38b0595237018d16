package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ZIP archive ingestion (PKWARE APPNOTE format) — the third common
  * corpus container after WARC and tar. Same scale shape: one task per
  * archive, per-partition flatMap, no shuffle.
  *
  * Reads the CENTRAL DIRECTORY (found via the end-of-central-directory
  * record scanned from the tail), so truncated/append-damaged archives
  * behave the way real unzip tools treat them: entries listed in the
  * directory and intact decode; everything else degrades. Methods:
  * stored and deflate (raw JDK Inflater). Every entry's CRC-32 is
  * VERIFIED — an entry whose bytes don't match its recorded CRC is
  * dropped, never emitted wrong. Entry names decode UTF-8 when the
  * entry's UTF-8 flag (general-purpose bit 11) is set, CP437-compatible
  * Latin otherwise. ZIP64 is supported within the byte[] model: the
  * EOCD64 locator/record resolve 64-bit entry counts and directory
  * offsets, and per-entry 0xFFFFFFFF markers resolve through the
  * ZIP64 extra field (APPNOTE §4.5.3) — dataset bundles with >65535
  * entries hit this even when physically small (the JDK's own
  * ZipOutputStream writes ZIP64 then, which is the interop fixture the
  * spec uses). Archives physically over the 2 GB byte[] cap still
  * degrade honestly: the central directory needs random access, so
  * there is no streaming fallback like tar/WARC's.
  */
object Zip {

  final case class Entry(name: String, data: Array[Byte])

  private val Eocd = 0x06054b50
  private val CenSig = 0x02014b50
  private val LocSig = 0x04034b50

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
  private def le64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }

  /** ZIP64 extended-information extra field (header id 0x0001): the
    * 64-bit replacements appear IN ORDER (raw size, compressed size,
    * local-header offset), each present only when its 32-bit field is
    * the 0xFFFFFFFF marker (PKWARE APPNOTE §4.5.3). Returns the three
    * resolved values, or None when a needed replacement is missing.
    */
  private def zip64Fields(b: Array[Byte], extraOff: Int, extraLen: Int,
                          raw32: Long, comp32: Long,
                          loc32: Long): Option[(Long, Long, Long)] = {
    val needRaw = raw32 == 0xFFFFFFFFL
    val needComp = comp32 == 0xFFFFFFFFL
    val needLoc = loc32 == 0xFFFFFFFFL
    if (!needRaw && !needComp && !needLoc) return Some((raw32, comp32, loc32))
    var p = extraOff
    val end = extraOff + extraLen
    while (p + 4 <= end) {
      val id = le16(b, p)
      val len = le16(b, p + 2)
      if (p + 4 + len > end) return None
      if (id == 0x0001) {
        var q = p + 4
        var raw = raw32
        var comp = comp32
        var loc = loc32
        def take(): Option[Long] =
          if (q + 8 <= p + 4 + len) { val v = le64(b, q); q += 8; Some(v) }
          else None
        if (needRaw) raw = take().getOrElse(return None)
        if (needComp) comp = take().getOrElse(return None)
        if (needLoc) loc = take().getOrElse(return None)
        return Some((raw, comp, loc))
      }
      p += 4 + len
    }
    None
  }

  /** [[Entry]] plus the central directory's exact raw size — survives
    * `needData = false` column pruning, where `data` is left empty.
    */
  final case class EntryMeta(name: String, size: Long, data: Array[Byte])

  /** All CRC-verified entries of a ZIP payload; Nil for non-ZIP data. */
  def entries(payload: Array[Byte]): Seq[Entry] =
    entriesFiltered(payload, _ => true, needData = true)
      .map(e => Entry(e.name, e.data))

  /** [[entries]] with SOURCE-SIDE entry skipping — the walk the DSv2
    * connector's pushdown compiles to. ZIP is the best case: names and
    * sizes live in the central directory, so `keep(name)` rejections and
    * `needData = false` pruning skip the local-header seek, the inflate,
    * AND the CRC check entirely — a name listing of a 4 GB archive reads
    * only the directory. Note the CRC therefore goes UNVERIFIED for
    * skipped data (it verifies what it decodes, and decode is exactly
    * what pruning avoids).
    */
  def entriesFiltered(payload: Array[Byte], keep: String => Boolean,
                      needData: Boolean): Seq[EntryMeta] = {
    if (payload == null || payload.length < 22) return Nil
    try {
      // EOCD scan from the tail (comment can push it up to 64 KB in)
      var eocd = -1
      var i = payload.length - 22
      val lo = math.max(0, payload.length - 22 - 0xFFFF)
      while (eocd < 0 && i >= lo) {
        if (le32(payload, i) == Eocd) eocd = i
        i -= 1
      }
      if (eocd < 0) return Nil
      var count: Long = le16(payload, eocd + 10)
      var cdOff: Long = le32(payload, eocd + 16)
      if (count == 0xFFFFL || cdOff == 0xFFFFFFFFL) {
        // ZIP64 (>65535 entries and/or >4 GB offsets — dataset bundles
        // hit the entry-count form even when physically small): the
        // EOCD64 locator sits 20 bytes before the EOCD and points at
        // the EOCD64 record carrying 64-bit count + directory offset
        val loc = eocd - 20
        if (loc < 0 || le32(payload, loc) != 0x07064b50L) return Nil
        val z64 = le64(payload, loc + 8)
        if (z64 < 0 || z64 + 56 > payload.length ||
          le32(payload, z64.toInt) != 0x06064b50L) return Nil
        count = le64(payload, z64.toInt + 32)
        cdOff = le64(payload, z64.toInt + 48)
      }
      // a 46-byte minimum per central entry bounds any hostile count
      if (cdOff > payload.length || count > payload.length / 46 + 1) return Nil
      val out = Seq.newBuilder[EntryMeta]
      var off = cdOff.toInt
      var n = 0
      while (n < count && off + 46 <= payload.length) {
        if (le32(payload, off) != CenSig) return out.result()
        val flags = le16(payload, off + 8)
        val method = le16(payload, off + 10)
        val crc = le32(payload, off + 16)
        val comp32 = le32(payload, off + 20)
        val raw32 = le32(payload, off + 24)
        val nameLen = le16(payload, off + 28)
        val extraLen = le16(payload, off + 30)
        val commentLen = le16(payload, off + 32)
        val loc32 = le32(payload, off + 42)
        val cs = if ((flags & (1 << 11)) != 0)
          java.nio.charset.StandardCharsets.UTF_8
        else java.nio.charset.StandardCharsets.ISO_8859_1
        val name = new String(payload, off + 46, nameLen, cs)
        // 0xFFFFFFFF markers resolve through the ZIP64 extra field; an
        // entry whose needed replacement is absent is damage → skipped
        zip64Fields(payload, off + 46 + nameLen, extraLen,
            raw32, comp32, loc32).foreach { case (rawSize, compSize, locOff) =>
          if (!name.endsWith("/") && locOff <= Int.MaxValue - 16 &&
            keep(name)) {
            if (!needData) out += EntryMeta(name, rawSize, Array.emptyByteArray)
            else decodeEntry(payload, locOff.toInt, method, compSize, rawSize, crc)
              .foreach(data => out += EntryMeta(name, rawSize, data))
          }
        }
        off += 46 + nameLen + extraLen + commentLen
        n += 1
      }
      out.result()
    } catch { case _: Exception => Nil }
  }

  /** Decode one entry via its local header; None when damaged (bad
    * signature, short data, inflate failure, or CRC mismatch).
    */
  private def decodeEntry(b: Array[Byte], locOff: Int, method: Int,
                          compSize: Long, rawSize: Long, wantCrc: Long): Option[Array[Byte]] = {
    try {
      if (locOff + 30 > b.length || le32(b, locOff) != LocSig) return None
      if (rawSize > Int.MaxValue - 16 || compSize > Int.MaxValue - 16) return None
      val nameLen = le16(b, locOff + 26)
      val extraLen = le16(b, locOff + 28)
      val dataOff = locOff + 30 + nameLen + extraLen
      if (dataOff + compSize > b.length) return None
      val data = method match {
        case 0 => // stored
          if (compSize != rawSize) return None
          java.util.Arrays.copyOfRange(b, dataOff, (dataOff + rawSize).toInt)
        case 8 => // deflate (raw stream: nowrap)
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(b, dataOff, compSize.toInt)
            val out = new Array[Byte](rawSize.toInt)
            var done = 0
            while (done < rawSize && !inf.finished()) {
              val k = inf.inflate(out, done, out.length - done)
              if (k == 0 && inf.needsInput()) return None // truncated
              done += k
            }
            if (done != rawSize) return None
            out
          } finally inf.end()
        case _ => return None // unsupported method: skip honestly
      }
      val crc = new java.util.zip.CRC32
      crc.update(data)
      if (crc.getValue != wantCrc) None else Some(data)
    } catch { case _: Exception => None }
  }

  // ---- Spark surface -------------------------------------------------------

  /** One row per verified entry of every archive in `files`
    * (path, content): (path, entry_name, n_bytes, data).
    */
  def files(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files.select(col("path").cast("string"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, content) =>
          entries(content).map(e => (path, e.name, e.data.length.toLong, e.data))
        }
      }
      .toDF("path", "entry_name", "n_bytes", "data")
  }

  /** Text entries by extension, UTF-8 with replacement — same contract
    * as [[Tar.textFiles]].
    */
  def textFiles(spark: SparkSession, archives: DataFrame,
                extensions: Seq[String] = Seq(".txt", ".json", ".jsonl", ".md", ".csv", ".tsv")): DataFrame = {
    import spark.implicits._
    files(spark, archives)
      .as[(String, String, Long, Array[Byte])]
      .flatMap { case (path, name, n, data) =>
        if (extensions.exists(name.toLowerCase.endsWith)) {
          val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
          val text = try dec.decode(java.nio.ByteBuffer.wrap(data)).toString
          catch { case _: Exception => "" }
          Some((path, name, n, text))
        } else None
      }
      .toDF("path", "entry_name", "n_bytes", "text")
  }
}
