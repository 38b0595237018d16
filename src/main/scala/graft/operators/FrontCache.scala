package graft.operators

import java.lang.ref.WeakReference

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of materialized operator FRONTS — expensive
  * intermediate frames (the prefix-doubling span front, a trained index)
  * that several independent queries of one run would otherwise each
  * recompute. Keyed on (session UUID, caller key); the caller key must
  * encode the corpus version (the sf directory) and every parameter the
  * front depends on (e.g. the span window L), so a different corpus or
  * policy knob can never read a stale front. The frame is
  * `localCheckpoint`ed on first build: values are pinned (a lazily
  * recomputed front could disagree with itself across reuses —
  * dense-label assignment is deterministic only within one
  * materialization) and the lineage is truncated, so every consumer
  * starts from stored blocks.
  *
  * This is the round-13 VERDICT ask #3: `suffix_array_topk` + the three
  * standalone decontamination heads + `pipeline_decontam_e2e` each paid
  * the full O(corpus·log L) suffix pipeline (~30 s of the 330 s bench as
  * four recomputations of one result). In a real curation run the front
  * is computed once and every head derives from it; this registry gives
  * the standalone query entry points the same shape without changing any
  * oracle contract — each query still DEFINES its full computation; the
  * registry only satisfies it from the pinned frame when one exists.
  *
  * Sessions are keyed by a per-session UUID (unique per session — an
  * identity hash could collide between a live session and a stopped one,
  * handing out a checkpointed frame bound to dead executors), and every
  * access
  * sweeps entries whose owning session is gone (GC'd or stopped), so a
  * stopped session's pinned checkpoint blocks don't outlive it.
  *
  * 100 TB: on a long-lived cluster the equivalent is a `Warehouse`
  * snapshot table keyed the same way (corpus-version, params) —
  * [[FrontStore]] is that persistent form (parquet snapshots with
  * corpus-fingerprint staleness checks); this in-memory registry is the
  * single-session variant; blocks live in executor storage (disk-backed)
  * and are bounded by the front's own size (spans frames are FAR smaller
  * than the corpus).
  */
object FrontCache {

  private val frames = TrieMap.empty[(String, String), DataFrame]
  private val values = TrieMap.empty[(String, String), Any]

  /** Owning sessions, weakly held: lets the sweep test liveness without
    * itself pinning a stopped session in memory.
    */
  private val owners = TrieMap.empty[String, WeakReference[SparkSession]]

  /** Session → registry id. The base `SparkSession` type exposes no
    * session UUID, so the registry assigns one per session OBJECT via a
    * weak identity map — unique by construction (an identity HASH can
    * collide between a live session and a stopped one, handing out a
    * checkpointed frame bound to dead executors) and non-pinning.
    */
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  private def sid(spark: SparkSession): String = {
    sweep()
    val id = ids.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID().toString)
    owners.putIfAbsent(id, new WeakReference(spark))
    id
  }

  /** Evict every entry whose owning session was GC'd or stopped — its
    * checkpointed blocks are unreadable (dead executors) and holding the
    * DataFrames would pin them for the JVM lifetime.
    */
  private def sweep(): Unit =
    owners.foreach { case (id, ref) =>
      val s = ref.get()
      val dead =
        s == null || (try s.sparkContext.isStopped catch {
          case _: Throwable => true
        })
      if (dead) {
        owners.remove(id)
        frames.keysIterator.filter(_._1 == id).foreach(frames.remove)
        values.keysIterator.filter(_._1 == id).foreach(values.remove)
      }
    }

  /** The pinned frame for `key`, building (and localCheckpoint-pinning)
    * it on first request.
    */
  def getOrCompute(spark: SparkSession, key: String)
                  (build: => DataFrame): DataFrame =
    frames.getOrElseUpdate((sid(spark), key), build.localCheckpoint())

  /** Driver-side front VALUES (a trained ANN index's centroids, a
    * collected statistic) — same keying contract as [[getOrCompute]],
    * no checkpoint needed: they're plain immutable objects. The build
    * must be deterministic for the same key (every index trainer here
    * is — the oracle gates depend on it).
    */
  def getOrComputeValue[T](spark: SparkSession, key: String)
                          (build: => T): T =
    values.getOrElseUpdate((sid(spark), key), build)
      .asInstanceOf[T]

  /** Drop this session's entries whose key starts with `keyPrefix` —
    * the bench's cold-rebuild hook (time a front build in a warm JVM
    * without discarding every OTHER front).
    */
  def invalidate(spark: SparkSession, keyPrefix: String): Unit = {
    val id = sid(spark)
    frames.keysIterator
      .filter(k => k._1 == id && k._2.startsWith(keyPrefix))
      .foreach(frames.remove)
    values.keysIterator
      .filter(k => k._1 == id && k._2.startsWith(keyPrefix))
      .foreach(values.remove)
  }

  /** Drop every cached front (tests; or to release executor storage). */
  def clear(): Unit = { frames.clear(); values.clear(); owners.clear() }
}
