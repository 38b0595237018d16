package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The PERSISTENT form of [[FrontCache]] — the 100 TB shape its doc
  * promises: per-corpus fronts (the prefix-doubling suffix span frame,
  * graph edge sets, the BM25 sparse leg, trained ANN indexes) as
  * fingerprint-keyed parquet snapshots, so a SECOND SESSION — tomorrow's
  * run of the same daily pipeline — reuses the artifact instead of
  * rebuilding the most expensive computations in the suite from scratch.
  *
  * Activation: set `spark.graft.fronts.path` to a directory. Unset (the
  * default), every front routes through the in-memory session-scoped
  * [[FrontCache]] exactly as before — benches and oracle runs are
  * unchanged unless a store is asked for.
  *
  * ALL IO — corpus fingerprinting, meta/schema/listing files, value
  * blobs, snapshot layout — goes through the Hadoop [[FileSystem]]
  * resolved from the owning session's hadoopConfiguration (round-15
  * ask #4): the store root AND the corpus dir may be any Hadoop-visible
  * path (hdfs://, s3a://, a conf-registered custom scheme). The
  * previous java.nio implementation silently returned a constant
  * fingerprint for non-local corpora, serving a persisted front forever
  * stale after the corpus changed.
  *
  * Staleness: each persisted front records a CORPUS FINGERPRINT — the
  * sorted RECURSIVE (path, length, mtime) listing of the corpus
  * directory, hashed — beside the snapshot, plus the listing itself. A
  * get under a changed corpus (new files, a re-generated table, a
  * different directory) misses and rebuilds into a new
  * fingerprint-keyed snapshot; the previous snapshot stays readable
  * until the meta swap (commit point), so concurrent readers never see
  * a half-written front.
  *
  * INCREMENTAL MAINTENANCE (round-15 ask #5): for a front whose rows
  * decompose per corpus file — every row derives from ONE file's
  * content (per-document postings, per-vector assignments) — an
  * additions-only corpus change (every previously-listed file unchanged
  * in length+mtime, new files appended) is served by
  * [[frameIncremental]] as `stored-rows ∪ deltaBuild(new files)`
  * instead of a full rebuild: at 100 TB the daily delta is hours of
  * data, not the corpus. The merged snapshot's ROWS are identical to
  * the full rebuild's by the decomposition contract, so every oracle
  * gate holds bit-for-bit whichever path produced the snapshot. Any
  * non-additive change (removal, rewrite, length/mtime drift) falls
  * back to the full build.
  *
  * GC (round-15 ask #6): a successful meta swap evicts every snapshot
  * dir and `value-*.bin` that is neither the NEW fingerprint's nor the
  * immediately-previous one (kept one version back so readers that
  * resolved the old snapshot just before the swap finish safely — the
  * Warehouse retention contract). The per-table lock map is a fixed
  * 64-stripe array, never growing with key count.
  *
  * Determinism note: a front build may be deterministic only WITHIN one
  * materialization (dense-label assignment). The store materializes the
  * build exactly once — into parquet — and every consumer (this session
  * and later ones) reads those stored rows, which is the same pinning
  * contract `localCheckpoint` gives the in-memory registry, made
  * durable.
  *
  * Concurrency: one JVM's threads are serialized per (store, table) by
  * the stripe lock; cross-process coordination is the lake-format
  * layer's job (as with [[Warehouse]] writes) — a cross-process race
  * costs a redundant rebuild, never a torn read (the meta swap is the
  * single commit point).
  */
object FrontStore {

  /** Session conf key: the store's root directory; unset = in-memory. */
  val PathConf = "spark.graft.fronts.path"

  private def root(spark: SparkSession): Option[String] =
    spark.conf.getOption(PathConf).filter(_.nonEmpty)

  /** Fixed-size lock striping: bounded memory however many distinct
    * fronts a long-lived process touches (the previous per-key TrieMap
    * grew forever); a stripe collision costs serialization, never
    * correctness.
    */
  private val locks = Array.fill(64)(new Object)
  private def lockFor(storeRoot: String, table: String): Object =
    locks(math.floorMod((storeRoot + "/" + table).hashCode, locks.length))

  private def sha256Hex(s: String, bytes: Int): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).take(bytes).map(b => f"$b%02x").mkString
  }

  /** Store-safe table name for a front key: readable sanitized prefix
    * plus a 16-hex SHA-256 of the FULL key. (The previous 32-bit
    * `String.hashCode` suffix let two distinct long keys share one
    * table and one fingerprint meta — one front's rows served for the
    * other's key with no staleness signal.)
    */
  private[graft] def tableName(key: String): String = {
    val safe = key.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c else '_')
      .take(80)
    s"front_${safe}_${sha256Hex(key, 8)}"
  }

  // ---- Hadoop-native corpus listing / fingerprint ------------------------

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** One listing entry per corpus DATA file, recursive:
    * `path\tlen\tmtime`, sorted (iteration-order independent). Hidden
    * and metadata files (`_SUCCESS`, `.crc` siblings — basenames
    * starting with `_` or `.`) are excluded, matching Spark's own scan
    * filter: they carry no data, and Spark REWRITES `_SUCCESS` on every
    * append — including it would make every additions-only batch read
    * as a mutation and defeat the incremental path. Recursion is manual
    * `listStatus` (not `listFiles`): RawLocalFileSystem's located
    * statuses eagerly load permissions and crash on conf-registered
    * custom schemes.
    */
  private[graft] def corpusListing(spark: SparkSession,
                                   corpusDir: String): Seq[String] = {
    val fs = fsFor(spark, corpusDir)
    val out = Seq.newBuilder[String]
    def walk(p: Path): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (st.isDirectory) walk(st.getPath)
          else out +=
            s"${st.getPath.toString}\t${st.getLen}\t${st.getModificationTime}"
        }
      }
    val p = new Path(corpusDir)
    val exists = try fs.exists(p) catch { case _: Exception => false }
    if (exists) walk(p)
    out.result().sorted
  }

  /** Corpus fingerprint: SHA-256 of the recursive sorted listing (or a
    * `missing:` sentinel when the directory does not exist — the build
    * itself will surface the real error).
    */
  private[graft] def corpusFingerprint(spark: SparkSession,
                                       corpusDir: String): String = {
    val listing = corpusListing(spark, corpusDir)
    val body =
      if (listing.isEmpty) s"missing:$corpusDir"
      else listing.mkString(s"$corpusDir|", "\n", "")
    sha256Hex(body, 8)
  }

  // ---- store file layout --------------------------------------------------

  private def tableDir(storeRoot: String, table: String) =
    new Path(storeRoot, table)
  private def metaPath(storeRoot: String, table: String) =
    new Path(tableDir(storeRoot, table), "_front_meta.json")
  private def schemaPath(storeRoot: String, table: String) =
    new Path(tableDir(storeRoot, table), "_front_schema.json")
  private def listingPath(storeRoot: String, table: String) =
    new Path(tableDir(storeRoot, table), "_front_listing.txt")
  private def snapPath(storeRoot: String, table: String, fp: String) =
    new Path(tableDir(storeRoot, table), s"snap-$fp")
  private def valuePath(storeRoot: String, table: String, fp: String) =
    new Path(tableDir(storeRoot, table), s"value-$fp.bin")

  private def readString(fs: FileSystem, p: Path): Option[String] =
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
      }
    } catch { case _: Exception => None }

  /** tmp-write + delete + rename: rename-over-existing is not portable
    * across Hadoop filesystems, so the destination is deleted first —
    * the brief missing-file window reads as a store MISS (a redundant
    * rebuild at worst, never a torn read).
    */
  private def writeStringAtomic(fs: FileSystem, p: Path, body: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"front store: cannot commit $p")
  }

  private def readSchema(fs: FileSystem, storeRoot: String,
                         table: String): Option[org.apache.spark.sql.types.StructType] =
    readString(fs, schemaPath(storeRoot, table)).flatMap { txt =>
      try org.apache.spark.sql.types.DataType.fromJson(txt) match {
        case st: org.apache.spark.sql.types.StructType => Some(st)
        case _ => None
      } catch { case _: Exception => None }
    }

  /** A committed front version: its corpus fingerprint, the SEGMENT
    * fingerprints whose snapshot dirs together hold its rows (one for a
    * full build; a chain for incremental appends), the fingerprints of
    * the PREVIOUS version's segments (retention), and the build mode.
    */
  private final case class Meta(fingerprint: String, segments: Seq[String],
                                prevSegments: Seq[String], mode: String)

  private def readMeta(fs: FileSystem, storeRoot: String,
                       table: String): Option[Meta] =
    readString(fs, metaPath(storeRoot, table)).flatMap { txt =>
      def field(name: String): Option[String] =
        (s""""$name"\\s*:\\s*"([0-9a-f;]*)"""").r
          .findFirstMatchIn(txt).map(_.group(1))
      field("fingerprint").map { fp =>
        val segs = field("segments").map(_.split(";").filter(_.nonEmpty).toSeq)
          .getOrElse(Seq(fp))
        val prev = field("prev_segments")
          .map(_.split(";").filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
        Meta(fp, segs, prev,
          """"mode"\s*:\s*"([a-z]+)"""".r.findFirstMatchIn(txt)
            .map(_.group(1)).getOrElse("full"))
      }
    }

  private def jsonEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** Commit point: schema + listing land first, the meta rename flips
    * the current version (fingerprint + segment list), then artifacts
    * referenced by neither the new nor the previous version are GC'd.
    */
  private def commit(fs: FileSystem, storeRoot: String, table: String,
                     key: String, fp: String, segments: Seq[String],
                     listing: Seq[String], schemaJson: Option[String],
                     mode: String): Unit = {
    val prev = readMeta(fs, storeRoot, table)
    schemaJson.foreach(js =>
      writeStringAtomic(fs, schemaPath(storeRoot, table), js))
    writeStringAtomic(fs, listingPath(storeRoot, table),
      listing.mkString("\n"))
    val prevSegs = prev.map(_.segments).getOrElse(Seq.empty)
    writeStringAtomic(fs, metaPath(storeRoot, table),
      s"""{"key":"${jsonEsc(key)}","fingerprint":"$fp",""" +
        s""""segments":"${segments.mkString(";")}",""" +
        s""""prev_segments":"${prevSegs.mkString(";")}",""" +
        s""""previous":"${prev.map(_.fingerprint).getOrElse("")}",""" +
        s""""mode":"$mode"}""")
    gc(fs, storeRoot, table,
      keep = segments.toSet ++ prevSegs ++ Set(fp) ++ prev.map(_.fingerprint))
  }

  /** Evict every snapshot dir / value bin whose fingerprint is not in
    * `keep` (the new version's segments + the immediately-previous
    * version's — kept one back so a reader that resolved the old
    * segment list just before the swap finishes safely).
    */
  private def gc(fs: FileSystem, storeRoot: String, table: String,
                 keep: Set[String]): Unit =
    try {
      fs.listStatus(tableDir(storeRoot, table)).foreach { st =>
        val n = st.getPath.getName
        val fp =
          if (st.isDirectory && n.startsWith("snap-")) Some(n.stripPrefix("snap-"))
          else if (st.isFile && n.startsWith("value-") && n.endsWith(".bin"))
            Some(n.stripPrefix("value-").stripSuffix(".bin"))
          else None
        fp.filterNot(keep).foreach(_ =>
          try fs.delete(st.getPath, true) catch { case _: Exception => () })
      }
    } catch { case _: Exception => () } // GC must never fail a build

  // ---- public API ----------------------------------------------------------

  /** The front FRAME for `key` over the corpus at `corpusDir`: from the
    * persistent store when one is configured and fresh (a lazy parquet
    * read — ZERO build jobs), rebuilding + persisting on
    * miss/staleness; from the in-memory [[FrontCache]] when no store is
    * configured.
    */
  def frame(spark: SparkSession, key: String, corpusDir: String)
           (build: => DataFrame): DataFrame =
    frameImpl(spark, key, corpusDir, build, None)

  /** [[frame]] for a PER-FILE-DECOMPOSABLE front: when the persisted
    * snapshot's corpus listing is a strict subset of the current one
    * (additions only — every old file unchanged in length+mtime),
    * `deltaBuild(newFiles)` runs over JUST the added files and the
    * union with the stored rows is committed as the new snapshot. The
    * decomposition contract (a row derives from one file's content
    * alone) makes that union row-identical to the full `build`; any
    * other corpus change falls back to `build`.
    */
  def frameIncremental(spark: SparkSession, key: String, corpusDir: String)
                      (build: => DataFrame)
                      (deltaBuild: Seq[String] => DataFrame): DataFrame =
    frameImpl(spark, key, corpusDir, build, Some(deltaBuild))

  /** Mode of the CURRENT persisted snapshot for `key` ("full",
    * "incremental", or None when absent/in-memory) — exhibit and spec
    * observability, never consulted by the serving path.
    */
  def currentMode(spark: SparkSession, key: String): Option[String] =
    root(spark).flatMap { storeRoot =>
      val fs = fsFor(spark, storeRoot)
      readString(fs, metaPath(storeRoot, tableName(key))).flatMap { txt =>
        """"mode"\s*:\s*"([a-z]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
      }
    }

  private def frameImpl(spark: SparkSession, key: String, corpusDir: String,
                        build: => DataFrame,
                        deltaBuild: Option[Seq[String] => DataFrame]): DataFrame =
    root(spark) match {
      case None => FrontCache.getOrCompute(spark, key)(build)
      case Some(storeRoot) =>
        val table = tableName(key)
        lockFor(storeRoot, table).synchronized {
          val fs = fsFor(spark, storeRoot)
          val listing = corpusListing(spark, corpusDir)
          val fp = corpusFingerprint(spark, corpusDir)
          def segsExist(m: Meta): Boolean = m.segments.forall(s =>
            try fs.exists(snapPath(storeRoot, table, s))
            catch { case _: Exception => false })
          val meta = readMeta(fs, storeRoot, table)
          val current = meta.filter(m => m.fingerprint == fp && segsExist(m))
          val segments: Seq[String] = current match {
            case Some(m) => m.segments
            case None =>
              deltaRows(spark, fs, storeRoot, table, listing, deltaBuild,
                meta.filter(segsExist)) match {
                // incremental: write ONLY the delta rows as a NEW segment
                // appended to the old chain — an O(delta) commit; the
                // stored rows are never read or rewritten (the manifest
                // append of the table formats). Serving unions segments.
                case Some((delta, oldSegs)) =>
                  delta.write.mode("overwrite")
                    .parquet(snapPath(storeRoot, table, fp).toString)
                  val segs = oldSegs :+ fp
                  commit(fs, storeRoot, table, key, fp, segs, listing,
                    Some(delta.schema.json), "incremental")
                  segs
                case None =>
                  val frame = build
                  frame.write.mode("overwrite")
                    .parquet(snapPath(storeRoot, table, fp).toString)
                  commit(fs, storeRoot, table, key, fp, Seq(fp), listing,
                    Some(frame.schema.json), "full")
                  Seq(fp)
              }
          }
          val paths = segments.map(s => snapPath(storeRoot, table, s).toString)
          readSchema(fs, storeRoot, table) match {
            case Some(st) => spark.read.schema(st).parquet(paths: _*)
            case None => spark.read.parquet(paths: _*) // legacy: infer
          }
        }
    }

  /** The delta segment (rows over JUST the added files) and the old
    * segment chain, when the stored listing is a strict subset of the
    * current one and the delta's schema matches the pinned one; None
    * forces the full build.
    */
  private def deltaRows(spark: SparkSession, fs: FileSystem,
                        storeRoot: String, table: String,
                        newListing: Seq[String],
                        deltaBuild: Option[Seq[String] => DataFrame],
                        oldMeta: Option[Meta])
      : Option[(DataFrame, Seq[String])] =
    for {
      delta <- deltaBuild
      m <- oldMeta
      oldListingTxt <- readString(fs, listingPath(storeRoot, table))
      oldListing = oldListingTxt.linesIterator.filter(_.nonEmpty).toSeq
      newSet = newListing.toSet
      if oldListing.nonEmpty && oldListing.forall(newSet)
      added = newListing.filterNot(oldListing.toSet)
      if added.nonEmpty
      oldSchema <- readSchema(fs, storeRoot, table)
      rows = delta(added.map(_.takeWhile(_ != '\t')))
      // the append is only sound if the delta's rows drop in beside the
      // stored ones unchanged — a schema drift means the front's shape
      // moved and the chain must be rebuilt from scratch
      if rows.schema == oldSchema
    } yield (rows, m.segments)

  /** Driver-side front VALUE (a trained index) — persisted via Java
    * serialization beside the frame tables, same fingerprint contract,
    * through the store's Hadoop filesystem. The build must be
    * deterministic for the key (every trainer here is); the store only
    * makes the determinism durable.
    */
  def value[T <: java.io.Serializable](spark: SparkSession, key: String,
                                       corpusDir: String)(build: => T): T =
    root(spark) match {
      case None => FrontCache.getOrComputeValue(spark, key)(build)
      case Some(storeRoot) =>
        val table = tableName(key)
        lockFor(storeRoot, table).synchronized {
          val fs = fsFor(spark, storeRoot)
          val fp = corpusFingerprint(spark, corpusDir)
          val bin = valuePath(storeRoot, table, fp)
          val stored: Option[T] =
            if (!(try fs.exists(bin) catch { case _: Exception => false })) None
            else
              try {
                val in = new java.io.ObjectInputStream(fs.open(bin))
                try Some(in.readObject().asInstanceOf[T]) finally in.close()
              } catch { case _: Exception => None }
          stored.getOrElse {
            val v = build
            try {
              val tmp = new Path(bin.getParent, bin.getName + ".tmp")
              val out = new java.io.ObjectOutputStream(fs.create(tmp, true))
              try out.writeObject(v) finally out.close()
              fs.delete(bin, false)
              fs.rename(tmp, bin)
              // value-only fronts swap + GC through the same commit path
              // (no schema) so superseded bins are evicted too
              commit(fs, storeRoot, table, key, fp, Seq(fp),
                corpusListing(spark, corpusDir), None, "full")
            } catch { case _: Exception => () } // unwritable → still served
            v
          }
        }
    }
}
