package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed warehouse with snapshot-swap semantics (SURVEY.md §7.1.2,
  * K1–K4). Plain Parquet has no row-level ops, so upserts write a NEW
  * snapshot directory and atomically repoint `_current`; readers always see
  * a complete snapshot. At cluster scale the same layout works on any
  * object store (pointer file on a consistent store); per-table snapshot
  * GC keeps the last N.
  */
class Warehouse(spark: SparkSession, root: String) {

  private def tableDir(name: String) = Paths.get(root, name)
  private def pointer(name: String)  = tableDir(name).resolve("_current")

  def exists(name: String): Boolean = Files.exists(pointer(name))

  private def currentSnapshot(name: String): Option[String] =
    if (exists(name)) Some(Files.readString(pointer(name)).trim) else None

  def read(name: String): DataFrame = {
    val snap = currentSnapshot(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    spark.read.parquet(tableDir(name).resolve(snap).toString)
  }

  /** K2 — truncate-overwrite: write a fresh snapshot, swap the pointer. */
  def overwrite(name: String, df: DataFrame): Unit = {
    val snap = s"snap-${System.nanoTime()}"
    Files.createDirectories(tableDir(name))
    df.write.mode("overwrite").parquet(tableDir(name).resolve(snap).toString)
    swapPointer(name, snap)
  }

  /** K1 — append: union with current snapshot into a new snapshot (keeps
    * swap atomicity; no in-place mutation of a live snapshot).
    */
  def append(name: String, df: DataFrame): Unit =
    if (!exists(name)) overwrite(name, df)
    else overwrite(name, read(name).unionByName(df, allowMissingColumns = true))

  /** Small-file compaction: rewrite the current snapshot into
    * ≈`targetFileBytes`-sized files (estimated from the snapshot's
    * on-disk size — compression carries over within a format) and
    * snapshot-swap. The append path accretes one file set per batch;
    * a 100 TB table read through thousands of tiny files pays per-file
    * open/footer costs and tiny row groups — periodic compaction is the
    * standing maintenance job of every lake table. Rows are unchanged
    * (the swap is atomic, readers see old or new, never a mix).
    */
  def compact(name: String, targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val snap = currentSnapshot(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val dir = tableDir(name).resolve(snap).toFile
    val bytes = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    overwrite(name, read(name).repartition(nFiles))
  }

  /** Retained snapshots, oldest first (time-travel surface; bounded by
    * [[keepSnapshots]]).
    */
  def snapshots(name: String): Seq[String] =
    Option(tableDir(name).toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
      .map(_.getName).toSeq.sorted // snap-<nanotime> sorts chronologically

  /** Time travel: read a RETAINED historical snapshot by name — the
    * audit/repro read ("what did the table say before that batch?").
    * The pointer stays untouched; GC retention ([[keepSnapshots]])
    * bounds how far back this reaches.
    */
  def readAt(name: String, snapshot: String): DataFrame = {
    require(snapshots(name).contains(snapshot),
      s"no retained snapshot '$snapshot' for table '$name' " +
        s"(have: ${snapshots(name).mkString(", ")})")
    spark.read.parquet(tableDir(name).resolve(snapshot).toString)
  }

  /** Data files of the current snapshot (compaction observability). */
  def dataFiles(name: String): Seq[String] = {
    val snap = currentSnapshot(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    Option(tableDir(name).resolve(snap).toFile.listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getName).toSeq.sorted
  }

  /** K4 — staged merge upsert into the table (creates it when absent). */
  def upsert(name: String, staging: DataFrame, key: String,
             updateCols: Seq[String]): Unit =
    if (!exists(name)) overwrite(name, staging)
    else overwrite(name, Upsert.merge(read(name), staging, key, updateCols))

  /** Partition-laid-out snapshot: same pointer-swap contract, but the
    * snapshot is written `partitionBy(cols)` so reads with a partition
    * predicate list only matching directories (PruningSpec asserts the
    * mechanism; WarehouseSpec asserts it holds through this API). At
    * 100 TB this is the difference between scanning one day and scanning
    * the table.
    */
  def overwritePartitioned(name: String, df: DataFrame,
                           partitionCols: Seq[String]): Unit = {
    val snap = s"snap-${System.nanoTime()}"
    Files.createDirectories(tableDir(name))
    df.write.mode("overwrite").partitionBy(partitionCols: _*)
      .parquet(tableDir(name).resolve(snap).toString)
    swapPointer(name, snap)
  }

  /** Dynamic-partition replace: partitions present in `df` are replaced
    * wholesale, untouched partitions carry over — the idempotent
    * reprocess-one-window write (Spark's dynamic partitionOverwriteMode,
    * expressed through the snapshot contract; a manifest/hardlink layout
    * would avoid rewriting carried-over data at scale).
    */
  def replacePartitions(name: String, df: DataFrame,
                        partitionCols: Seq[String]): Unit =
    if (!exists(name)) overwritePartitioned(name, df, partitionCols)
    else {
      val incoming = df.select(partitionCols.map(org.apache.spark.sql.functions.col): _*).distinct()
      val kept = read(name).join(incoming, partitionCols, "left_anti")
      overwritePartitioned(name,
        kept.unionByName(df, allowMissingColumns = true), partitionCols)
    }

  private def swapPointer(name: String, snap: String): Unit = {
    val tmp = tableDir(name).resolve(s"_current.tmp.${System.nanoTime()}")
    Files.writeString(tmp, snap)
    Files.move(tmp, pointer(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    gc(name)
  }

  /** Snapshot GC: keep the current snapshot plus the most recent
    * `keepSnapshots − 1` others; older ones are deleted. Readers of a
    * just-replaced snapshot finish safely as long as churn stays within
    * the retention window (same contract as table-format VACUUM).
    */
  var keepSnapshots: Int = 3
  private def gc(name: String): Unit = {
    val cur = currentSnapshot(name).getOrElse(return)
    val dir = tableDir(name).toFile
    val snaps = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("snap-"))
      .sortBy(_.getName).reverse // snap-<nanotime>: newest first
    snaps.filterNot(_.getName == cur).drop(keepSnapshots - 1).foreach { f =>
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete()
      }
      rm(f)
    }
  }
}
