package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 (validity-interval) dimension maintenance.
  *
  * [[fromLog]] builds the interval table from a change log in one pass;
  * [[applyChanges]] folds NEWER changes into a standing interval table
  * without touching the history of unaffected keys — the warehouse-side
  * operation a nightly dimension load actually runs.
  *
  * Law (pinned by spec AND by the `scd2_apply` oracle, which builds the
  * one-shot form in SQL):
  * `applyChanges(fromLog(log ≤ D), log > D) ≡ fromLog(log)`.
  *
  * Scale: applyChanges shuffles only the DELTA's keys — untouched keys
  * pass through with an anti join (no window), and the per-key interval
  * rebuild windows over (open row + new changes) only, so the window
  * input is O(|delta| + |affected keys|), never the standing table.
  */
object Scd2 {

  /** One validity interval per log row: `valid_from` = the change ts,
    * `valid_to` = the key's next change ts (NULL = still current).
    * Requires (key, ts) unique — dedupe re-deliveries upstream
    * (e.g. row_number over a tiebreaker), so interval bounds are
    * well-defined.
    */
  def fromLog(changes: DataFrame, keyCol: String, tsCol: String,
              stateCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    changes
      .select((Seq(col(keyCol), col(tsCol).as("valid_from")) ++
        stateCols.map(col)): _*)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time snapshot of a [[fromLog]]-shaped interval table: the
    * row version valid at `asOf` (valid_from <= asOf < valid_to, open
    * intervals current). A narrow filter — at scale it pushes down to the
    * scan, and a table partitioned/z-ordered on `valid_from` prunes.
    */
  def snapshotAt(intervals: DataFrame, asOf: org.apache.spark.sql.Column): DataFrame =
    intervals.where(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))

  /** Fold `delta` (changes strictly after the standing table's horizon)
    * into `existing` (a [[fromLog]]-shaped table). Keys absent from the
    * delta pass through untouched; for affected keys the closed history
    * is kept and the open row is re-chained with the new changes.
    * Precondition: every delta ts is later than its key's open
    * `valid_from` (the delta is newer than the table horizon); violations
    * would interleave into closed history and need a rebuild of that key.
    */
  def applyChanges(existing: DataFrame, delta: DataFrame, keyCol: String,
                   tsCol: String, stateCols: Seq[String]): DataFrame = {
    val affected = delta.select(col(keyCol)).distinct()
    val untouched = existing.join(affected, Seq(keyCol), "left_anti")
    val touched = existing.join(affected, Seq(keyCol), "left_semi")
    val closed = touched.where(col("valid_to").isNotNull)
    val reopened = touched.where(col("valid_to").isNull)
      .select((Seq(col(keyCol), col("valid_from").as(tsCol)) ++
        stateCols.map(col)): _*)
    val chain = reopened.unionByName(
      delta.select((Seq(col(keyCol), col(tsCol)) ++ stateCols.map(col)): _*))
    untouched.unionByName(closed)
      .unionByName(fromLog(chain, keyCol, tsCol, stateCols))
  }
}
