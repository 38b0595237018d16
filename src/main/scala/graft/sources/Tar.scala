package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tar archive ingestion (POSIX ustar + the two long-name extensions
  * every real corpus tarball uses) — text/JSONL training corpora are
  * routinely shipped as `.tar.gz`; this reads them straight into rows
  * with the same scale shape as [[Warc]]: one task per archive file, a
  * per-partition flatMap, no shuffle.
  *
  * Implemented: 512-byte ustar headers with VERIFIED checksums (the
  * octal sum with the checksum field blanked), octal and GNU base-256
  * sizes, regular-file entries, GNU 'L' long-name records, and pax 'x'
  * extended headers (the `path=` keyword). gzip payloads inflate
  * transparently. Directories, links, and other entry types are
  * skipped. A bad header ends that archive's parse at the last good
  * entry (tar has no resync marker), never a throw.
  */
object Tar {

  final case class Entry(name: String, data: Array[Byte])

  /** [[Entry]] plus the exact payload size — survives `needData = false`
    * column pruning, where `data` is left empty.
    */
  final case class EntryMeta(name: String, size: Long, data: Array[Byte])

  /** All regular-file entries of a (possibly gzipped) tar payload. */
  def entries(payload: Array[Byte]): Seq[Entry] =
    entriesFiltered(payload, _ => true, needData = true)
      .map(e => Entry(e.name, e.data))

  /** [[entries]] with SOURCE-SIDE entry skipping — the walk the DSv2
    * connector's pushdown compiles to: `keep(name)` is evaluated on the
    * header block alone, so a rejected entry's payload is never copied;
    * `needData = false` skips the copy for kept entries too (column
    * pruning — a name/size listing walks 512-byte headers only). Sizes
    * stay exact either way.
    */
  def entriesFiltered(payload: Array[Byte], keep: String => Boolean,
                      needData: Boolean): Seq[EntryMeta] = {
    // a gzipped tar can be far smaller than one tar block — only the
    // INFLATED stream must clear 512 bytes
    if (payload == null || payload.length < 18) return Nil
    val bytes =
      if ((payload(0) & 0xFF) == 0x1F && (payload(1) & 0xFF) == 0x8B) gunzip(payload)
      else payload
    if (bytes == null || bytes.length < 512) return Nil
    val out = Seq.newBuilder[EntryMeta]
    var off = 0
    var pendingName: String = null // from 'L' / pax records
    var ok = true
    while (ok && off + 512 <= bytes.length) {
      if (isZeroBlock(bytes, off)) ok = false // end-of-archive marker
      else {
        val header = java.util.Arrays.copyOfRange(bytes, off, off + 512)
        if (!checksumValid(header)) ok = false
        else {
          val size = parseSize(header)
          val typeflag = header(156) & 0xFF
          val dataStart = off + 512
          val dataEnd = dataStart + size
          if (size < 0 || dataEnd > bytes.length) ok = false
          else {
            typeflag match {
              case 0x30 | 0x00 => // '0' and the pre-POSIX NUL both mean regular file
                val name =
                  if (pendingName != null) pendingName
                  else {
                    val prefix = cstr(header, 345, 155)
                    val base = cstr(header, 0, 100)
                    if (prefix.nonEmpty) s"$prefix/$base" else base
                  }
                pendingName = null
                if (keep(name))
                  out += EntryMeta(name, size,
                    if (needData)
                      java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd.toInt)
                    else Array.emptyByteArray)
              case 0x4C => // GNU 'L' long name: data block IS the next entry's name
                pendingName = cstr(bytes, dataStart, size.toInt)
              case 0x78 | 0x67 => // pax 'x'/'g' extended header: "len key=value\n" records
                paxPath(bytes, dataStart, dataEnd.toInt).foreach(pendingName = _)
              case _ => pendingName = null // dirs, links, devices: skip
            }
            off = dataEnd.toInt + ((512 - (size % 512)) % 512).toInt
          }
        }
      }
    }
    out.result()
  }

  /** Streaming entry walk — the >2 GiB path, mirroring
    * [[Warc.parseStream]]: tar is a sequence of 512-byte headers and
    * padded payloads, so it streams naturally (gzip-transparent,
    * concatenated members included). Heap holds one ENTRY at a time —
    * corpus tarballs routinely exceed the JVM byte[] cap where Common
    * Crawl WARCs don't, so this matters even more here. Per-entry
    * degrade is STRONGER than the byte[] walk's: an individual payload
    * over 2 GB is skipped (its bytes streamed past) and the walk
    * continues, instead of the whole archive degrading. `keep(name)` /
    * `needData` behave exactly as in [[entriesFiltered]]. A bad header
    * ends the walk at the last good entry; nothing throws.
    *
    * A KEPT entry whose payload exceeds `maxBytes` (the byte[] cap by
    * default; a knob so specs can exercise the path without a 2 GiB
    * fixture) is NOT silently dropped — it emits a MARKER row (name,
    * exact size, `null` data) with its bytes streamed past. At 100 TB
    * ingest scale a kept-but-vanished entry is unaccounted data loss;
    * `null` data is distinguishable from both an empty file
    * (zero-length array) and pruning (`needData = false`, where the
    * over-cap entry emits the same empty array as every other row).
    *
    * The caller owns `in`'s lifetime ([[filesFromPaths]] shows the
    * close-at-exhaustion pattern).
    */
  def entriesStream(in: java.io.InputStream,
                    keep: String => Boolean = _ => true,
                    needData: Boolean = true,
                    maxBytes: Long = Int.MaxValue - 16): Iterator[EntryMeta] = {
    val s: java.io.InputStream =
      try {
        val pb = new java.io.PushbackInputStream(
          new java.io.BufferedInputStream(in, 1 << 16), 2)
        val b1 = pb.read()
        if (b1 < 0) return Iterator.empty
        val b2 = pb.read()
        if (b2 >= 0) pb.unread(b2)
        pb.unread(b1)
        if (b1 == 0x1F && b2 == 0x8B)
          new java.util.zip.GZIPInputStream(pb, 1 << 16)
        else pb
      } catch { case _: java.io.IOException => return Iterator.empty }

    var pendingName: String = null
    def nextEntry(): EntryMeta =
      try {
        while (true) {
          val header = s.readNBytes(512)
          if (header.length < 512 || isZeroBlock(header, 0)) return null
          if (!checksumValid(header)) return null
          val size = parseSize(header)
          if (size < 0) return null
          val pad = ((512 - (size % 512)) % 512).toInt
          val typeflag = header(156) & 0xFF
          typeflag match {
            case 0x30 | 0x00 => // regular file
              val name =
                if (pendingName != null) pendingName
                else {
                  val prefix = cstr(header, 345, 155)
                  val base = cstr(header, 0, 100)
                  if (prefix.nonEmpty) s"$prefix/$base" else base
                }
              pendingName = null
              if (!keep(name)) {
                // rejected payload: stream past it
                s.skipNBytes(size + pad)
              } else if (needData && size > math.min(maxBytes, Int.MaxValue - 16L)) {
                // kept but over the cap: bytes streamed past, but the
                // entry is ACCOUNTED with a null-data marker row
                s.skipNBytes(size + pad)
                return EntryMeta(name, size, null)
              } else if (!needData) {
                s.skipNBytes(size + pad)
                return EntryMeta(name, size, Array.emptyByteArray)
              } else {
                val data = s.readNBytes(size.toInt)
                if (data.length < size) return null // truncated tail
                s.skipNBytes(pad)
                return EntryMeta(name, size, data)
              }
            case 0x4C => // GNU 'L' long name
              if (size > (1 << 20)) return null // hostile name length
              val data = s.readNBytes(size.toInt)
              if (data.length < size) return null
              s.skipNBytes(pad)
              pendingName = cstr(data, 0, size.toInt)
            case 0x78 | 0x67 => // pax extended header
              if (size > (1 << 20)) return null
              val data = s.readNBytes(size.toInt)
              if (data.length < size) return null
              s.skipNBytes(pad)
              paxPath(data, 0, size.toInt).foreach(pendingName = _)
            case _ =>
              pendingName = null
              s.skipNBytes(size + pad)
          }
        }
        null // unreachable
      } catch {
        case _: java.io.IOException => null // incl. EOF/Zip mid-skip
      }

    new Iterator[EntryMeta] {
      private var ahead: EntryMeta = nextEntry()
      def hasNext: Boolean = ahead != null
      def next(): EntryMeta = {
        val r = ahead
        ahead = nextEntry()
        r
      }
    }
  }

  private def isZeroBlock(b: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + 512) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Header checksum: octal field at 148(8), sum computed with that
    * field read as spaces; accept the historical signed variant too.
    */
  private def checksumValid(h: Array[Byte]): Boolean = {
    val want = parseOctal(h, 148, 8)
    if (want < 0) return false
    var unsigned = 0L
    var signed = 0L
    var i = 0
    while (i < 512) {
      val v = if (i >= 148 && i < 156) ' '.toInt else h(i) & 0xFF
      val sv = if (i >= 148 && i < 156) ' '.toInt else h(i).toInt
      unsigned += v
      signed += sv
      i += 1
    }
    want == unsigned || want == signed
  }

  /** Size field: octal, or GNU base-256 (top bit of first byte set). */
  private def parseSize(h: Array[Byte]): Long = {
    if ((h(124) & 0x80) != 0) {
      var v = (h(124) & 0x7F).toLong
      var i = 125
      while (i < 136) { v = (v << 8) | (h(i) & 0xFF); i += 1 }
      v
    } else parseOctal(h, 124, 12)
  }

  private def parseOctal(h: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    var seen = false
    while (i < off + len) {
      val c = h(i) & 0xFF
      if (c >= '0' && c <= '7') { v = (v << 3) | (c - '0'); seen = true }
      else if (c != ' ' && c != 0) return -1L
      else if (seen) return v
      i += 1
    }
    if (seen) v else -1L
  }

  private def cstr(b: Array[Byte], off: Int, max: Int): String = {
    var end = off
    val lim = math.min(off + max, b.length)
    while (end < lim && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** pax records: "<decimal len> <key>=<value>\n"; returns `path`. */
  private def paxPath(b: Array[Byte], from: Int, to: Int): Option[String] = {
    var off = from
    var found: Option[String] = None
    while (off < to) {
      var sp = off
      while (sp < to && b(sp) != ' ') sp += 1
      if (sp >= to) return found
      val len = try new String(b, off, sp - off, "ASCII").toInt
      catch { case _: NumberFormatException => return found }
      if (len <= 0 || off + len > to) return found
      val rec = new String(b, sp + 1, off + len - sp - 2,
        java.nio.charset.StandardCharsets.UTF_8) // drop trailing \n
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path") found = Some(rec.substring(eq + 1))
      off += len
    }
    found
  }

  private def gunzip(gz: Array[Byte]): Array[Byte] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gz), 1 << 16)
      val out = new java.io.ByteArrayOutputStream(math.min(gz.length * 4, 1 << 20))
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      var total = 0L
      while (n > 0) {
        total += n
        // over the JVM byte[] cap: degrade this ARCHIVE to Nil (null →
        // no entries) rather than throw out of entries() and fail the
        // whole Spark task on one oversized file — the file's "never a
        // throw" contract. Archives that big belong on the streaming
        // path (Warc.recordsFromPaths is the per-record-stream pattern).
        if (total > Int.MaxValue - 16) return null
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.ZipException => null
      case _: java.io.EOFException => null
    }
  }

  // ---- Spark surface -------------------------------------------------------

  /** One row per regular-file entry of every archive in `files`
    * (path, content): (path, entry_name, n_bytes, data). Narrow
    * per-file flatMap — no shuffle.
    */
  def files(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files.select(col("path").cast("string"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, content) =>
          entries(content).map(e =>
            (path, e.name, e.data.length.toLong, e.data))
        }
      }
      .toDF("path", "entry_name", "n_bytes", "data")
  }

  /** [[files]] over file PATHS — the >2 GiB route: each task opens its
    * archive through the Hadoop filesystem and walks entries via
    * [[entriesStream]], one entry in heap at a time. Same row schema
    * and one-task-per-file parallelism; unreadable paths degrade to
    * zero rows.
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
              Some(hp.getFileSystem(conf).open(hp))
            } catch { case _: Exception => None }
          opened match {
            case None => Iterator.empty
            case Some(in) =>
              open = in
              val base = entriesStream(in)
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

  /** Text entries only (by extension), decoded UTF-8 with replacement —
    * the row shape a JSONL/text corpus tarball feeds into `from_json` /
    * the text families.
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
