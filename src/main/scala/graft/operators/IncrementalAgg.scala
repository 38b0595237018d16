package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: a standing per-key aggregate table
  * updated by DELTA batches instead of recomputed from history — the
  * materialized-view form of the reference's run-metrics accumulation
  * (`ExtractionLogger.py:95-123` recounts against the full table every
  * run; this keeps the running totals and folds in each batch).
  *
  * Only works for aggregates with mergeable partials (count, sum, min,
  * max — anything forming a commutative monoid per column). At 100 TB
  * the difference is structural: each refresh shuffles only the delta's
  * partial aggregate (one small hash agg + one key-to-key outer join
  * against the standing table), never the accumulated history.
  */
object IncrementalAgg {

  /** How a maintained column merges: existing ⊕ delta. */
  sealed trait Merge { def apply(e: Column, d: Column): Column }
  case object Add extends Merge {
    def apply(e: Column, d: Column): Column =
      coalesce(e, lit(0)) + coalesce(d, lit(0))
  }
  case object Min extends Merge {
    def apply(e: Column, d: Column): Column = least(e, d) // NULL-ignoring
  }
  case object Max extends Merge {
    def apply(e: Column, d: Column): Column = greatest(e, d)
  }

  /** Merge a delta's per-key partial aggregates into the standing table.
    * Both sides carry `keys` plus the maintained columns; keys present on
    * only one side pass through (full-outer + presence markers, same
    * construction as Upsert.merge — key nullability is NOT a presence
    * signal).
    */
  def applyDelta(existing: DataFrame, delta: DataFrame,
                 keys: Seq[String], merges: Map[String, Merge]): DataFrame = {
    require(!(existing.columns ++ delta.columns)
        .exists(Set("__e_present", "__d_present")),
      "__e_present/__d_present are reserved working column names")
    val e = existing.withColumn("__e_present", lit(true)).alias("e")
    val d = delta.withColumn("__d_present", lit(true)).alias("d")
    val cond = keys.map(k => col(s"e.$k") <=> col(s"d.$k")).reduce(_ && _)
    val joined = e.join(d, cond, "full_outer")
    val keyCols = keys.map(k => coalesce(col(s"e.$k"), col(s"d.$k")).as(k))
    // caller-stable output order: existing-schema order, then any
    // delta-only maintained columns (Map iteration order is
    // insertion-stable only up to 4 entries — never rely on it)
    val orderedCols =
      (existing.columns ++ delta.columns).distinct.toSeq.filter(merges.contains)
    val valCols = orderedCols.map { c =>
      val m = merges(c)
      when(col("e.__e_present").isNotNull && col("d.__d_present").isNotNull,
        m(col(s"e.$c"), col(s"d.$c")))
        .when(col("e.__e_present").isNull, col(s"d.$c"))
        .otherwise(col(s"e.$c")).as(c)
    }
    joined.select(keyCols ++ valCols: _*)
  }

  /** Delta of an inner equi-join — the join half of materialized-view
    * maintenance: with disjoint splits A = A₀ ∪ ΔA and B = B₀ ∪ ΔB,
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B  ∪  A₀ ⋈ ΔB
    *
    * (ΔA⋈B covers the (ΔA,B₀) and (ΔA,ΔB) pairs; A₀⋈ΔB the rest — each
    * new pair exactly once). Feed the result through [[applyDelta]] to
    * maintain an aggregate-over-join without recomputing history.
    *
    * Scale shape: both joins put the DELTA on the broadcast side, so
    * the standing tables are scanned once each but never shuffled — a
    * full recompute shuffles |A| + |B| every refresh; the delta refresh
    * shuffles nothing (broadcasts are |ΔA| + |ΔB|). Caller projects
    * both inputs to a common schema first.
    */
  def deltaJoin(a0: DataFrame, da: DataFrame, b0: DataFrame, db: DataFrame,
                cond: Column): DataFrame =
    broadcast(da).join(b0.unionByName(db), cond)
      .unionByName(a0.join(broadcast(db), cond))

  /** Weighted (Z-set) per-key partials: every delta row carries a weight
    * (+1 insert, −1 retraction), and each value column aggregates as
    * Σ w·v with the key's live-row count as Σ w — the DBSP/differential-
    * dataflow algebra that lets DELETIONS maintain incrementally too
    * (plain [[Add]] deltas can only grow; min/max genuinely cannot
    * retract without history and are excluded by construction here).
    * Feed the result through [[applyDelta]] with [[Add]] merges, then
    * [[dropDeadKeys]] removes keys whose live count reached zero.
    */
  def weightedPartial(delta: DataFrame, keys: Seq[String], weightCol: String,
                      valueCols: Seq[String]): DataFrame = {
    val aggs = sum(col(weightCol)).as("n") +:
      valueCols.map(c => sum(col(c) * col(weightCol)).as(c))
    delta.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Remove keys whose maintained live count is zero (fully retracted). */
  def dropDeadKeys(standing: DataFrame, countCol: String = "n"): DataFrame =
    standing.where(col(countCol) =!= 0)

  /** Warehouse-backed refresh: aggregate the batch to per-key partials
    * with `partialAgg`, fold them into `table` (bootstrap on first run),
    * snapshot-swap. Returns the new standing table.
    */
  def refresh(wh: Warehouse, table: String, batch: DataFrame,
              keys: Seq[String], merges: Map[String, Merge])
             (partialAgg: DataFrame => DataFrame): DataFrame = {
    val partial = partialAgg(batch)
    val merged =
      if (wh.exists(table)) applyDelta(wh.read(table), partial, keys, merges)
      else partial
    wh.overwrite(table, merged)
    wh.read(table)
  }
}
