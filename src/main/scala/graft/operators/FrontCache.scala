package graft.operators

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of materialized operator FRONTS — expensive
  * intermediate frames (the prefix-doubling span front, a trained index)
  * that several independent queries of one run would otherwise each
  * recompute. Keyed on (session, caller key); the caller key must encode
  * the corpus version (the sf directory) and every parameter the front
  * depends on (e.g. the span window L), so a different corpus or policy
  * knob can never read a stale front. The frame is `localCheckpoint`ed on
  * first build: values are pinned (a lazily recomputed front could
  * disagree with itself across reuses — dense-label assignment is
  * deterministic only within one materialization) and the lineage is
  * truncated, so every consumer starts from stored blocks.
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
  * 100 TB: on a long-lived cluster the equivalent is a `Warehouse`
  * snapshot table keyed the same way (corpus-version, params) — this
  * in-memory form is the single-session variant; blocks live in executor
  * storage (disk-backed) and are bounded by the front's own size (spans
  * frames are FAR smaller than the corpus).
  */
object FrontCache {

  private val frames = TrieMap.empty[(Int, String), DataFrame]

  /** The pinned frame for `key`, building (and localCheckpoint-pinning)
    * it on first request. Sessions are keyed by object identity — the
    * base `SparkSession` trait exposes no session UUID, and identity is
    * exactly the lifetime a checkpointed frame is valid for.
    */
  def getOrCompute(spark: SparkSession, key: String)
                  (build: => DataFrame): DataFrame =
    frames.getOrElseUpdate((System.identityHashCode(spark), key),
      build.localCheckpoint())

  private val values = TrieMap.empty[(Int, String), Any]

  /** Driver-side front VALUES (a trained ANN index's centroids, a
    * collected statistic) — same keying contract as [[getOrCompute]],
    * no checkpoint needed: they're plain immutable objects. The build
    * must be deterministic for the same key (every index trainer here
    * is — the oracle gates depend on it).
    */
  def getOrComputeValue[T](spark: SparkSession, key: String)
                          (build: => T): T =
    values.getOrElseUpdate((System.identityHashCode(spark), key), build)
      .asInstanceOf[T]

  /** Drop every cached front (tests; or to release executor storage). */
  def clear(): Unit = { frames.clear(); values.clear() }
}
