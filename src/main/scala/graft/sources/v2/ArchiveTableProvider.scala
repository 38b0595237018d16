package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{Tar, Warc, Zip}

/** DataSource V2 connectors for the archive trio (WARC / tar / ZIP) —
  * round-13 VERDICT ask #5. The `binaryFile` + flatMap surface parses
  * EVERY record before any filter can run; these providers plan one
  * input partition per archive file (the Common Crawl execution model,
  * same as the flatMap surface) and push two things INTO the parse walk:
  *
  *  - **filter pushdown** (SupportsPushDownFilters): equality/prefix
  *    predicates on the record-identity columns (WARC: `warc_type`,
  *    `target_uri`, `content_type`; tar/ZIP: `entry_name`) compile to
  *    the sources' filtered walks ([[Warc.parseStreamFiltered]],
  *    [[Tar.entriesFiltered]], [[Zip.entriesFiltered]]), so a rejected
  *    record's payload is never allocated, envelope-parsed, inflated,
  *    or CRC'd — under a selective predicate (one host out of a crawl
  *    segment) the task walks headers instead of inflating gigabytes.
  *    Pushed filters stay advisory: Spark re-applies them plan-side, so
  *    correctness never depends on the walk's skipping.
  *  - **column pruning** (SupportsPushDownRequiredColumns): when no
  *    block-derived column is requested (WARC: `body`/`http_*`; archives:
  *    `data`), the walk skips payloads of KEPT records too — a
  *    name/size listing of a 100 TB crawl reads record headers only.
  *
  * WARC and tar read through STREAMING walks (one record/entry in heap
  * at a time — >2 GiB archives fine, which corpus tarballs routinely
  * are); ZIP reads its central directory by SEEK (Hadoop inputs are
  * seekable) and each kept entry by positioned reads — >2 GiB ZIP64
  * archives walk with only the directory + one entry in heap, and
  * rejected/pruned entries' local bytes are never touched.
  *
  * Usage: {{{
  *   spark.read.format("graft.sources.v2.WarcTableProvider").load(dir)
  *     .where($"warc_type" === "response" &&
  *            $"target_uri".startsWith("https://en."))
  * }}}
  */
object ArchiveTables {

  val WarcSchema: StructType = StructType(Seq(
    StructField("path", StringType), StructField("warc_type", StringType),
    StructField("record_id", StringType), StructField("warc_date", StringType),
    StructField("target_uri", StringType), StructField("content_type", StringType),
    StructField("content_length", LongType), StructField("http_status", IntegerType),
    StructField("http_content_type", StringType),
    StructField("http_content_encoding", StringType),
    StructField("http_transfer_encoding", StringType),
    StructField("body", BinaryType)))

  val EntrySchema: StructType = StructType(Seq(
    StructField("path", StringType), StructField("entry_name", StringType),
    StructField("n_bytes", LongType), StructField("data", BinaryType)))

  /** WARC columns whose values live inside the record BLOCK — requesting
    * none of them lets the walk skip kept records' payloads too.
    */
  val WarcBlockCols: Set[String] = Set("body", "http_status",
    "http_content_type", "http_content_encoding", "http_transfer_encoding")

  /** Driver-side file listing for option("path"): a glob, a directory
    * (children, optionally matched against `pathGlobFilter`), or a
    * single file — through the Hadoop filesystem, like every other scan.
    */
  def listFiles(confEntries: Map[String, String], path: String,
                globFilter: String): Seq[String] = {
    val conf = rebuildConf(confEntries)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val roots = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = roots.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }
    val named =
      if (globFilter.isEmpty) files
      else {
        val m = org.apache.hadoop.fs.GlobPattern.compile(globFilter)
        files.filter(f => m.matcher(f.getPath.getName).matches())
      }
    named.map(_.getPath.toString).sorted
  }

  /** Compile the pushed subset to a name predicate (None = accept all).
    * Conjunction semantics: every pushed filter must hold.
    */
  private[v2] def namePredicate(pushed: Seq[sources.Filter],
                                col: String): String => Boolean = {
    val tests = pushed.collect {
      case sources.EqualTo(a, v: String) if a == col => (n: String) => n == v
      case sources.StringStartsWith(a, p) if a == col => (n: String) => n.startsWith(p)
      case sources.StringEndsWith(a, p) if a == col => (n: String) => n.endsWith(p)
      case sources.StringContains(a, p) if a == col => (n: String) => n.contains(p)
    }
    n => n != null && tests.forall(_(n))
  }

  private[v2] def acceptable(f: sources.Filter, cols: Set[String]): Boolean =
    f match {
      case sources.EqualTo(a, _: String) => cols(a)
      case sources.StringStartsWith(a, _) => cols(a)
      case sources.StringEndsWith(a, _) => cols(a)
      case sources.StringContains(a, _) => cols(a)
      case _ => false
    }

  /** The session's Hadoop configuration as a serializable entry map —
    * captured DRIVER-SIDE at scan build and rebuilt in each partition
    * reader (the `Warc.recordsFromPaths` pattern). A fresh executor-side
    * `new Configuration()` works on a local filesystem but silently
    * drops everything the session set — s3a/gcs credentials, fs.*
    * overrides, custom `fs.<scheme>.impl` registrations — so a path
    * that LISTS fine on the driver would yield zero rows per file.
    */
  def sessionConfEntries(
      spark: org.apache.spark.sql.SparkSession): Map[String, String] =
    spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap

  def rebuildConf(entries: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private val log = org.slf4j.LoggerFactory.getLogger("graft.sources.v2")

  /** Open a file through the SHIPPED session conf; an unreadable file
    * degrades to None (a crawl batch with one bad file must not lose
    * the other 99 999) but is LOGGED, never swallowed silently.
    */
  def openLogged(path: String, confEntries: Map[String, String]): Option[org.apache.hadoop.fs.FSDataInputStream] =
    try {
      val hp = new org.apache.hadoop.fs.Path(path)
      Some(hp.getFileSystem(rebuildConf(confEntries)).open(hp))
    } catch {
      case e: Exception =>
        log.warn(s"archive scan: cannot open $path (${e.getClass.getSimpleName}: ${e.getMessage}); emitting zero rows for this file")
        None
    }
}

/** Walk counters for the spec's "parsed records < total records" audit
  * (local-mode visible; a cluster build would surface these through the
  * DSv2 custom-metric API instead).
  */
object ArchiveScanMetrics {
  val materialized = new java.util.concurrent.atomic.LongAdder
  val skipped = new java.util.concurrent.atomic.LongAdder
  def reset(): Unit = { materialized.reset(); skipped.reset() }
}

// ---------------------------------------------------------------- WARC --

class WarcTableProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArchiveTables.WarcSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
}

class WarcTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"warc:${props.getOrElse("path", "?")}"
  override def schema(): StructType = ArchiveTables.WarcSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  // Hadoop conf captured HERE — newScanBuilder runs during planning on
  // the owning session's thread. Deferring the capture to
  // createReaderFactory (execution time) read SparkSession.active, which
  // in a multi-session setup can be a DIFFERENT session than the one
  // that planned the scan, shipping the wrong session's fs credentials
  // and custom-scheme registrations to the partition readers.
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(props ++ options.asScala,
      ArchiveTables.sessionConfEntries(org.apache.spark.sql.SparkSession.active))
}

class WarcScanBuilder(props: Map[String, String],
                      confEntries: Map[String, String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = ArchiveTables.WarcSchema
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val cols = Set("warc_type", "target_uri", "content_type")
    pushed = filters.filter(ArchiveTables.acceptable(_, cols))
    filters // advisory: Spark re-applies everything plan-side
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  override def build(): Scan = new WarcScan(required, pushed, props, confEntries)
}

class WarcScan(required: StructType, pushed: Array[sources.Filter],
               props: Map[String, String],
               confEntries: Map[String, String]) extends Scan with Batch {
  private val needBlock =
    required.fieldNames.exists(ArchiveTables.WarcBlockCols)
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"WarcScan(${props.getOrElse("path", "?")}, " +
      s"pushed=${pushed.mkString("[", ",", "]")}, needBlock=$needBlock)"

  override def planInputPartitions(): Array[InputPartition] =
    ArchiveTables.listFiles(confEntries,
        props.getOrElse("path",
          throw new IllegalArgumentException("warc scan needs a path")),
        props.getOrElse("pathGlobFilter", ""))
      .map(f => ArchiveFilePartition(f).asInstanceOf[InputPartition]).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, pushed.toSeq, needBlock, confEntries)
}

case class ArchiveFilePartition(path: String) extends InputPartition

class WarcReaderFactory(required: StructType, pushed: Seq[sources.Filter],
                        needBlock: Boolean, confEntries: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ArchiveFilePartition]
    new WarcPartitionReader(p.path, required, pushed, needBlock, confEntries)
  }
}

class WarcPartitionReader(path: String, required: StructType,
                          pushed: Seq[sources.Filter], needBlock: Boolean,
                          confEntries: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val typeKeep = ArchiveTables.namePredicate(pushed, "warc_type")
  private val uriKeep = ArchiveTables.namePredicate(pushed, "target_uri")
  private val ctKeep = ArchiveTables.namePredicate(pushed, "content_type")

  private val in: java.io.InputStream =
    ArchiveTables.openLogged(path, confEntries).orNull // unreadable → zero rows

  private val pathU = UTF8String.fromString(path)
  private def u(s: String): UTF8String = UTF8String.fromString(s)

  // one extractor per REQUIRED field, bound once (not per row)
  private val getters: Array[Warc.WarcRecord => Any] =
    required.fieldNames.map {
      case "path" => (_: Warc.WarcRecord) => pathU
      case "warc_type" => (r: Warc.WarcRecord) => u(r.warcType)
      case "record_id" => (r: Warc.WarcRecord) => u(r.recordId)
      case "warc_date" => (r: Warc.WarcRecord) => u(r.date)
      case "target_uri" => (r: Warc.WarcRecord) => u(r.targetUri)
      case "content_type" => (r: Warc.WarcRecord) => u(r.contentType)
      case "content_length" => (r: Warc.WarcRecord) => r.contentLength
      case "http_status" => (r: Warc.WarcRecord) => r.httpStatus
      case "http_content_type" => (r: Warc.WarcRecord) => u(r.httpContentType)
      case "http_content_encoding" => (r: Warc.WarcRecord) => u(r.httpContentEncoding)
      case "http_transfer_encoding" => (r: Warc.WarcRecord) => u(r.httpTransferEncoding)
      case "body" => (r: Warc.WarcRecord) => r.body
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  private val rows: Iterator[Warc.WarcRecord] =
    if (in == null) Iterator.empty
    else Warc.parseStreamFiltered(in, (t, uri, ct) => {
      val k = typeKeep(t) && uriKeep(uri) && ctKeep(ct)
      if (k) ArchiveScanMetrics.materialized.add(1)
      else ArchiveScanMetrics.skipped.add(1)
      k
    }, needBlock)

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) {
      val r = rows.next()
      val vals = new Array[Any](getters.length)
      var i = 0
      while (i < getters.length) { vals(i) = getters(i)(r); i += 1 }
      current = new GenericInternalRow(vals)
      true
    } else false
  override def get(): InternalRow = current
  override def close(): Unit =
    if (in != null) { try in.close() catch { case _: Exception => () } }
}

// ----------------------------------------------------------- tar / ZIP --

/** Tar and ZIP share the (path, entry_name, n_bytes, data) surface; the
  * concrete provider picks the walk. `format` travels in the partition
  * (a String, trivially serializable) and resolves executor-side.
  */
abstract class EntryArchiveProvider(format: String) extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArchiveTables.EntrySchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EntryArchiveTable(format, properties.asScala.toMap)
}

class TarTableProvider extends EntryArchiveProvider("tar")
class ZipTableProvider extends EntryArchiveProvider("zip")

class EntryArchiveTable(format: String, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"$format:${props.getOrElse("path", "?")}"
  override def schema(): StructType = ArchiveTables.EntrySchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  // conf captured at planning time on the owning session's thread — see
  // the WarcTable note (execution-time SparkSession.active can be a
  // different session in multi-session setups)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EntryArchiveScanBuilder(format, props ++ options.asScala,
      ArchiveTables.sessionConfEntries(org.apache.spark.sql.SparkSession.active))
}

class EntryArchiveScanBuilder(format: String, props: Map[String, String],
                              confEntries: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = ArchiveTables.EntrySchema
  private var pushed: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters.filter(ArchiveTables.acceptable(_, Set("entry_name")))
    filters
  }
  override def pushedFilters(): Array[sources.Filter] = pushed
  override def build(): Scan =
    new EntryArchiveScan(format, required, pushed, props, confEntries)
}

class EntryArchiveScan(format: String, required: StructType,
                       pushed: Array[sources.Filter],
                       props: Map[String, String],
                       confEntries: Map[String, String]) extends Scan with Batch {
  private val needData = required.fieldNames.contains("data")
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"${format.capitalize}Scan(${props.getOrElse("path", "?")}, " +
      s"pushed=${pushed.mkString("[", ",", "]")}, needData=$needData)"

  override def planInputPartitions(): Array[InputPartition] =
    ArchiveTables.listFiles(confEntries,
        props.getOrElse("path",
          throw new IllegalArgumentException(s"$format scan needs a path")),
        props.getOrElse("pathGlobFilter", ""))
      .map(f => ArchiveFilePartition(f).asInstanceOf[InputPartition]).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new EntryArchiveReaderFactory(format, required, pushed.toSeq, needData,
      confEntries)
}

class EntryArchiveReaderFactory(format: String, required: StructType,
                                pushed: Seq[sources.Filter],
                                needData: Boolean,
                                confEntries: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EntryArchiveReader(format,
      partition.asInstanceOf[ArchiveFilePartition].path, required, pushed,
      needData, confEntries)
}

class EntryArchiveReader(format: String, path: String, required: StructType,
                         pushed: Seq[sources.Filter], needData: Boolean,
                         confEntries: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val keep = ArchiveTables.namePredicate(pushed, "entry_name")
  private val pathU = UTF8String.fromString(path)

  private val counted = (n: String) => {
    val k = keep(n)
    if (k) ArchiveScanMetrics.materialized.add(1)
    else ArchiveScanMetrics.skipped.add(1)
    k
  }

  /** The task's open stream, if any — closed at drain AND in [[close]]:
    * an early-terminated scan (LIMIT, take(1)) never drains the
    * iterator, and a no-op close() would leak one handle per task.
    */
  private var openStream: java.io.InputStream = null

  private val entries: Iterator[(String, Long, Array[Byte])] = format match {
    // tar streams (512-byte headers + payloads in sequence): one entry
    // in heap at a time, no whole-file cap — corpus tarballs routinely
    // exceed the byte[] limit
    case "tar" =>
      ArchiveTables.openLogged(path, confEntries) match {
        case None => Iterator.empty
        case Some(in) =>
          openStream = in
          val base = Tar.entriesStream(in, counted, needData)
            .map(e => (e.name, e.size, e.data))
          new Iterator[(String, Long, Array[Byte])] {
            def hasNext: Boolean = {
              val h = base.hasNext
              if (!h) closeStream()
              h
            }
            def next() = base.next()
          }
      }
    // ZIP streams too since r15: the central directory is read by SEEK
    // (tail + directory only), then each kept entry is decoded from its
    // own seek — no whole-archive byte[], so >2 GiB ZIP64 archives walk
    // fine and a name listing reads only the directory
    case "zip" =>
      ArchiveTables.openLogged(path, confEntries) match {
        case None => Iterator.empty
        case Some(in) =>
          openStream = in
          val len =
            try {
              val hp = new org.apache.hadoop.fs.Path(path)
              hp.getFileSystem(ArchiveTables.rebuildConf(confEntries))
                .getFileStatus(hp).getLen
            } catch { case _: Exception => -1L }
          if (len < 0) { closeStream(); Iterator.empty }
          else {
            val base = Zip.entriesSeekable(in, len, counted, needData)
              .map(e => (e.name, e.size, e.data))
            new Iterator[(String, Long, Array[Byte])] {
              def hasNext: Boolean = {
                val h = base.hasNext
                if (!h) closeStream()
                h
              }
              def next() = base.next()
            }
          }
      }
    case other => throw new IllegalArgumentException(s"format $other")
  }

  private def closeStream(): Unit = {
    val s = openStream
    openStream = null
    if (s != null) { try s.close() catch { case _: Exception => () } }
  }

  private val getters: Array[((String, Long, Array[Byte])) => Any] =
    required.fieldNames.map {
      case "path" => (_: (String, Long, Array[Byte])) => pathU
      case "entry_name" => (e: (String, Long, Array[Byte])) => UTF8String.fromString(e._1)
      case "n_bytes" => (e: (String, Long, Array[Byte])) => e._2
      case "data" => (e: (String, Long, Array[Byte])) => e._3
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (entries.hasNext) {
      val e = entries.next()
      val vals = new Array[Any](getters.length)
      var i = 0
      while (i < getters.length) { vals(i) = getters(i)(e); i += 1 }
      current = new GenericInternalRow(vals)
      true
    } else false
  override def get(): InternalRow = current
  override def close(): Unit = closeStream()
}
