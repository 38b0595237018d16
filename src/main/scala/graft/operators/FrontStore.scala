package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The PERSISTENT form of [[FrontCache]] — the 100 TB shape its doc
  * promises: per-corpus fronts (the prefix-doubling suffix span frame,
  * graph edge sets, the BM25 sparse leg, trained ANN indexes) as
  * `Warehouse` snapshot tables keyed on (front key, corpus fingerprint),
  * so a SECOND SESSION — tomorrow's run of the same daily pipeline —
  * reuses the artifact instead of rebuilding the most expensive
  * computations in the suite from scratch.
  *
  * Activation: set `spark.graft.fronts.path` to a directory. Unset (the
  * default), every front routes through the in-memory session-scoped
  * [[FrontCache]] exactly as before — benches and oracle runs are
  * unchanged unless a store is asked for.
  *
  * Staleness: each persisted front records a CORPUS FINGERPRINT — the
  * sorted (name, length, mtime) listing of the corpus directory, hashed —
  * beside the snapshot. A get under a changed corpus (new files, a
  * re-generated table, a different directory) misses and rebuilds into a
  * new snapshot; the stale snapshot stays readable until the swap (the
  * Warehouse pointer flip is atomic), so concurrent readers never see a
  * half-written front.
  *
  * Determinism note: a front build may be deterministic only WITHIN one
  * materialization (dense-label assignment). The store materializes the
  * build exactly once — into parquet — and every consumer (this session
  * and later ones) reads those stored rows, which is the same pinning
  * contract `localCheckpoint` gives the in-memory registry, made durable.
  *
  * 100 TB: the store root is any Hadoop-visible path in production (the
  * Warehouse layout is a pointer file + snapshot dirs, object-store
  * safe); fronts are orders of magnitude smaller than the corpus, and
  * re-reading them as parquet scans is exactly how a long-lived cluster
  * would serve them.
  */
object FrontStore {

  /** Session conf key: the store's root directory; unset = in-memory. */
  val PathConf = "spark.graft.fronts.path"

  private def root(spark: SparkSession): Option[String] =
    spark.conf.getOption(PathConf).filter(_.nonEmpty)

  /** One lock per (store, table): two threads of one process must not
    * race the build+swap of the same front (cross-process coordination
    * is the lake-format layer's job, as with [[Warehouse]] writes).
    */
  private val locks = TrieMap.empty[String, Object]

  /** Warehouse-safe table name for a front key: readable prefix plus an
    * 8-hex hash of the full key (keys carry paths and '=' parameters).
    */
  private[graft] def tableName(key: String): String = {
    val safe = key.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c else '_')
      .take(80)
    f"front_${safe}_${key.hashCode & 0xFFFFFFFFL}%08x"
  }

  /** Corpus fingerprint: sorted (name, length, mtime) of the corpus
    * directory's files, hashed. Any regenerated/added/removed file —
    * or a different directory — changes it.
    */
  private[graft] def corpusFingerprint(corpusDir: String): String = {
    val dir = Paths.get(corpusDir)
    val listing =
      if (!Files.isDirectory(dir)) s"missing:$corpusDir"
      else {
        val s = Files.list(dir)
        try s.iterator().asScala
          .map(p => s"${p.getFileName}:${fileLen(p)}:${fileMtime(p)}")
          .toSeq.sorted.mkString(s"$corpusDir|", ",", "")
        finally s.close()
      }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(listing.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
  }
  private def fileLen(p: java.nio.file.Path): Long =
    try Files.size(p) catch { case _: Exception => -1L }
  private def fileMtime(p: java.nio.file.Path): Long =
    try Files.getLastModifiedTime(p).toMillis catch { case _: Exception => -1L }

  private def metaPath(storeRoot: String, table: String) =
    Paths.get(storeRoot, table, "_front_meta.json")

  /** The front's schema is pinned BESIDE the snapshot so a later
    * session's read needs no parquet schema inference (inference runs a
    * footer-reading job over the snapshot files — the "zero recompute
    * jobs on a store hit" contract would quietly leak jobs).
    */
  private def schemaPath(storeRoot: String, table: String) =
    Paths.get(storeRoot, table, "_front_schema.json")

  private def readSchema(storeRoot: String,
                         table: String): Option[org.apache.spark.sql.types.StructType] =
    try {
      val p = schemaPath(storeRoot, table)
      if (!Files.exists(p)) None
      else org.apache.spark.sql.types.DataType.fromJson(Files.readString(p)) match {
        case st: org.apache.spark.sql.types.StructType => Some(st)
        case _ => None
      }
    } catch { case _: Exception => None }

  private def readMeta(storeRoot: String, table: String): Option[String] =
    try {
      val p = metaPath(storeRoot, table)
      if (!Files.exists(p)) None
      else {
        val txt = Files.readString(p)
        val m = """"fingerprint"\s*:\s*"([0-9a-f]+)"""".r
        m.findFirstMatchIn(txt).map(_.group(1))
      }
    } catch { case _: Exception => None }

  private def writeMeta(storeRoot: String, table: String, key: String,
                        fp: String): Unit = {
    val p = metaPath(storeRoot, table)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    val esc = key.replace("\\", "\\\\").replace("\"", "\\\"")
    Files.writeString(tmp,
      s"""{"key":"$esc","fingerprint":"$fp"}""")
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** The front FRAME for `key` over the corpus at `corpusDir`: from the
    * persistent store when one is configured and fresh (a lazy parquet
    * read — ZERO build jobs), rebuilding + persisting on miss/staleness;
    * from the in-memory [[FrontCache]] when no store is configured.
    */
  def frame(spark: SparkSession, key: String, corpusDir: String)
           (build: => DataFrame): DataFrame =
    root(spark) match {
      case None => FrontCache.getOrCompute(spark, key)(build)
      case Some(storeRoot) =>
        val table = tableName(key)
        val lock = locks.getOrElseUpdate(s"$storeRoot/$table", new Object)
        lock.synchronized {
          val wh = new Warehouse(spark, storeRoot)
          val fp = corpusFingerprint(corpusDir)
          if (!readMeta(storeRoot, table).contains(fp) || !wh.exists(table)) {
            val frame = build
            wh.overwrite(table, frame)
            val tmp = schemaPath(storeRoot, table)
              .resolveSibling("_front_schema.json.tmp")
            Files.writeString(tmp, frame.schema.json)
            Files.move(tmp, schemaPath(storeRoot, table),
              StandardCopyOption.REPLACE_EXISTING,
              StandardCopyOption.ATOMIC_MOVE)
            writeMeta(storeRoot, table, key, fp)
          }
          readSchema(storeRoot, table) match {
            case Some(st) => spark.read.schema(st).parquet(wh.currentPath(table))
            case None => wh.read(table) // legacy snapshot: infer
          }
        }
    }

  /** Driver-side front VALUE (a trained index) — persisted via Java
    * serialization beside the frame tables, same fingerprint contract.
    * The build must be deterministic for the key (every trainer here
    * is); the store only makes the determinism durable.
    */
  def value[T <: java.io.Serializable](spark: SparkSession, key: String,
                                       corpusDir: String)(build: => T): T =
    root(spark) match {
      case None => FrontCache.getOrComputeValue(spark, key)(build)
      case Some(storeRoot) =>
        val table = tableName(key)
        val lock = locks.getOrElseUpdate(s"$storeRoot/$table", new Object)
        lock.synchronized {
          val fp = corpusFingerprint(corpusDir)
          val bin = Paths.get(storeRoot, table, s"value-$fp.bin")
          if (Files.exists(bin)) {
            try {
              val in = new java.io.ObjectInputStream(
                Files.newInputStream(bin))
              try in.readObject().asInstanceOf[T] finally in.close()
            } catch { case _: Exception => buildAndStore(bin, build) }
          } else buildAndStore(bin, build)
        }
    }

  private def buildAndStore[T <: java.io.Serializable](
      bin: java.nio.file.Path, build: => T): T = {
    val v = build
    try {
      Files.createDirectories(bin.getParent)
      val tmp = bin.resolveSibling(bin.getFileName.toString + ".tmp")
      val out = new java.io.ObjectOutputStream(Files.newOutputStream(tmp))
      try out.writeObject(v) finally out.close()
      Files.move(tmp, bin, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Exception => () } // store unwritable → value still served
    v
  }
}
