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
  * spec uses). Archives over the 2 GB byte[] cap walk through
  * [[entriesSeekable]]: Hadoop inputs are seekable, so the central
  * directory reads by position and each entry decodes from its own
  * positioned reads — the whole archive is never in heap (only the
  * byte[] CONVENIENCE surface, [[entries]] over an in-memory payload,
  * keeps the 2 GB bound).
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

  /** All CRC-verified entries of a ZIP payload; Nil for non-ZIP data.
    * Damaged entries (null-data markers in [[entriesFiltered]]) are
    * dropped here — this surface's contract is "verified bytes only".
    */
  def entries(payload: Array[Byte]): Seq[Entry] =
    entriesFiltered(payload, _ => true, needData = true)
      .collect { case e if e.data != null => Entry(e.name, e.data) }

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
            // the ROW SET must be projection-independent: a damaged
            // entry (CRC mismatch, unsupported method, truncated local
            // header) emits a null-data marker instead of vanishing —
            // otherwise select(entry_name) and select(entry_name, data)
            // over the same archive would return different row counts
            if (!needData) out += EntryMeta(name, rawSize, Array.emptyByteArray)
            else out += EntryMeta(name, rawSize,
              decodeEntry(payload, locOff.toInt, method, compSize, rawSize, crc)
                .orNull)
          }
        }
        off += 46 + nameLen + extraLen + commentLen
        n += 1
      }
      out.result()
    } catch { case _: Exception => Nil }
  }

  /** One parsed central-directory entry (offsets already ZIP64-resolved). */
  private final case class CenEntry(name: String, method: Int, crc: Long,
                                    compSize: Long, rawSize: Long,
                                    locOff: Long)

  /** Parse central-directory BYTES (read separately from the archive —
    * the seekable walk's form) into entry descriptors. Damage degrades
    * to the entries parsed so far; never throws.
    */
  private def parseCentral(cd: Array[Byte], count: Long): Seq[CenEntry] = {
    val out = Seq.newBuilder[CenEntry]
    var off = 0
    var n = 0L
    val bounded = math.min(count, cd.length / 46L + 1)
    try {
      while (n < bounded && off + 46 <= cd.length) {
        if (le32(cd, off) != CenSig) return out.result()
        val flags = le16(cd, off + 8)
        val method = le16(cd, off + 10)
        val crc = le32(cd, off + 16)
        val comp32 = le32(cd, off + 20)
        val raw32 = le32(cd, off + 24)
        val nameLen = le16(cd, off + 28)
        val extraLen = le16(cd, off + 30)
        val commentLen = le16(cd, off + 32)
        val loc32 = le32(cd, off + 42)
        val cs = if ((flags & (1 << 11)) != 0)
          java.nio.charset.StandardCharsets.UTF_8
        else java.nio.charset.StandardCharsets.ISO_8859_1
        if (off + 46 + nameLen > cd.length) return out.result()
        val name = new String(cd, off + 46, nameLen, cs)
        zip64Fields(cd, off + 46 + nameLen, extraLen, raw32, comp32, loc32)
          .foreach { case (rawSize, compSize, locOff) =>
            out += CenEntry(name, method, crc, compSize, rawSize, locOff)
          }
        off += 46 + nameLen + extraLen + commentLen
        n += 1
      }
      out.result()
    } catch { case _: Exception => out.result() }
  }

  /** STREAMING/SEEKING entry walk over a Hadoop input — the >2 GiB
    * path the byte[] walk can't take (round-14 VERDICT ask #6). ZIP
    * needs random access, and Hadoop inputs ARE seekable: the tail scan
    * finds the EOCD (+ EOCD64), ONE positioned read pulls the central
    * directory (compact — 46+name bytes per entry, megabytes for
    * millions of entries, never the archive), and each KEPT entry
    * decodes from its own positioned reads. `keep` rejections and
    * `needData = false` pruning never touch an entry's local bytes — a
    * name listing of a 100 GB archive reads only the directory. Decode
    * damage emits the null-data marker row ([[entriesFiltered]]'s
    * projection-independence contract); an entry over the per-entry
    * byte[] cap emits the marker too (accounted, like the tar walk),
    * with nothing read. Anything unparseable degrades to the entries
    * walked so far; never throws. The caller owns `in`'s lifetime.
    */
  def entriesSeekable(in: org.apache.hadoop.fs.FSDataInputStream,
                      fileLen: Long, keep: String => Boolean,
                      needData: Boolean): Iterator[EntryMeta] = {
    val cen: Seq[CenEntry] =
      try {
        if (fileLen < 22) Seq.empty
        else {
          // EOCD within the last 22+64K bytes (comment), plus room for
          // the EOCD64 locator (20) — one tail read covers the scan
          val tailLen = math.min(fileLen, 22L + 0xFFFF + 20).toInt
          val tailBase = fileLen - tailLen
          val tail = new Array[Byte](tailLen)
          in.readFully(tailBase, tail)
          var eocd = -1
          var i = tailLen - 22
          while (eocd < 0 && i >= 0) {
            if (le32(tail, i) == Eocd) eocd = i
            i -= 1
          }
          if (eocd < 0) Seq.empty
          else {
            var count: Long = le16(tail, eocd + 10)
            var cdSize: Long = le32(tail, eocd + 12)
            var cdOff: Long = le32(tail, eocd + 16)
            if (count == 0xFFFFL || cdOff == 0xFFFFFFFFL ||
              cdSize == 0xFFFFFFFFL) {
              // EOCD64 locator sits 20 bytes before the EOCD; the
              // EOCD64 record itself can be anywhere → positioned read
              val loc = eocd - 20
              if (loc < 0 || le32(tail, loc) != 0x07064b50L) return Iterator.empty
              val z64 = le64(tail, loc + 8)
              if (z64 < 0 || z64 + 56 > fileLen) return Iterator.empty
              val rec = new Array[Byte](56)
              in.readFully(z64, rec)
              if (le32(rec, 0) != 0x06064b50L) return Iterator.empty
              count = le64(rec, 32)
              cdSize = le64(rec, 40)
              cdOff = le64(rec, 48)
            }
            if (cdOff < 0 || cdSize < 0 || cdOff + cdSize > fileLen ||
              cdSize > Int.MaxValue - 16) Seq.empty
            else {
              val cd = new Array[Byte](cdSize.toInt)
              in.readFully(cdOff, cd)
              parseCentral(cd, count)
            }
          }
        }
      } catch { case _: Exception => Seq.empty }

    cen.iterator.filter(e => !e.name.endsWith("/") && keep(e.name))
      .map { e =>
        if (!needData) EntryMeta(e.name, e.rawSize, Array.emptyByteArray)
        else if (e.rawSize > Int.MaxValue - 16 ||
          e.compSize > Int.MaxValue - 16)
          EntryMeta(e.name, e.rawSize, null) // over-cap: accounted marker
        else EntryMeta(e.name, e.rawSize,
          decodeSeekable(in, fileLen, e).orNull)
      }
  }

  /** Decode one entry via positioned reads of its local header + data;
    * None when damaged (mirrors [[decodeEntry]]'s checks).
    */
  private def decodeSeekable(in: org.apache.hadoop.fs.FSDataInputStream,
                             fileLen: Long, e: CenEntry): Option[Array[Byte]] = {
    try {
      if (e.locOff < 0 || e.locOff + 30 > fileLen) return None
      val loc = new Array[Byte](30)
      in.readFully(e.locOff, loc)
      if (le32(loc, 0) != LocSig) return None
      val nameLen = le16(loc, 26)
      val extraLen = le16(loc, 28)
      val dataOff = e.locOff + 30 + nameLen + extraLen
      if (dataOff + e.compSize > fileLen) return None
      val comp = new Array[Byte](e.compSize.toInt)
      in.readFully(dataOff, comp)
      val data = e.method match {
        case 0 => // stored
          if (e.compSize != e.rawSize) return None
          comp
        case 8 => // deflate (raw stream: nowrap)
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(comp)
            val out = new Array[Byte](e.rawSize.toInt)
            var done = 0
            while (done < e.rawSize && !inf.finished()) {
              val k = inf.inflate(out, done, out.length - done)
              if (k == 0 && inf.needsInput()) return None // truncated
              done += k
            }
            if (done != e.rawSize) return None
            out
          } finally inf.end()
        case _ => return None // unsupported method: marker row upstream
      }
      val crc = new java.util.zip.CRC32
      crc.update(data)
      if (crc.getValue != e.crc) None else Some(data)
    } catch { case _: Exception => None }
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

  /** [[files]] over file PATHS — the >2 GiB route, mirroring
    * [[Tar.filesFromPaths]]: each task opens its archive through the
    * Hadoop filesystem (session conf broadcast) and walks entries via
    * [[entriesSeekable]] — directory by positioned read, one entry in
    * heap at a time. Damaged entries surface as null-data marker rows
    * (the projection-independence contract); unreadable paths degrade
    * to zero rows. Same row schema, one task per archive, no shuffle.
    */
  def filesFromPaths(spark: SparkSession, paths: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val hadoopConfSer = spark.sparkContext.broadcast(
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toMap)
    paths.select(col("path").cast("string")).as[String]
      .mapPartitions { it =>
        lazy val conf = {
          val c = new org.apache.hadoop.conf.Configuration(false)
          hadoopConfSer.value.foreach { case (k, v) => c.set(k, v) }
          c
        }
        // close-at-exhaustion alone leaks the CURRENT archive's stream
        // when the task terminates early (LIMIT/take never drains the
        // iterator) — the task-completion listener closes whatever is
        // still open, one registration per partition
        var open: java.io.InputStream = null
        def closeOpen(): Unit = {
          val s = open; open = null
          if (s != null) { try s.close() catch { case _: Exception => () } }
        }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOpen()))
        it.flatMap { p =>
          val opened =
            try {
              val hp = new org.apache.hadoop.fs.Path(p)
              val fs = hp.getFileSystem(conf)
              Some((fs.open(hp), fs.getFileStatus(hp).getLen))
            } catch { case _: Exception => None }
          opened match {
            case None => Iterator.empty
            case Some((in, len)) =>
              open = in
              val base = entriesSeekable(in, len, _ => true, needData = true)
                .map(e => (p, e.name, e.size, e.data))
              new Iterator[(String, String, Long, Array[Byte])] {
                def hasNext: Boolean = {
                  val h = base.hasNext
                  if (!h && (open eq in)) closeOpen()
                  h
                }
                def next() = base.next()
              }
          }
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
