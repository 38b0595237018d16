package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach the single nearest right row
  * with the same key — most recent at-or-before (backward) or earliest
  * at-or-after (forward) the left time.
  *
  * Spark has no ASOF JOIN operator. The textbook formulations are a range
  * join (candidate explosion, then a per-left-row argmax — two wide
  * stages) or broadcasting the whole right side (dies when the right side
  * is a fact table). This is the union-and-fill plan instead: tag both
  * sides, union them, and run `last(payload, ignoreNulls)` over ONE
  * (key, time)-ordered running window. Both directions use the same
  * running (unboundedPreceding, currentRow) frame — forward simply scans
  * time DESCENDING. (A (currentRow, unboundedFollowing) frame would be
  * the obvious forward spelling, but Spark executes unbounded-following
  * frames by re-scanning to the partition end for every row — O(n²) per
  * key group.)
  *
  * Scale shape: cost is ONE shuffle of |left| + |right| rows and zero
  * candidate blow-up; the window sort partitions by the join key, so the
  * plan parallelizes per key group and skew tooling (salting by key)
  * composes. At 100 TB this is the same shape databases use for
  * merge-based ASOF — no stage materializes more rows than its input.
  *
  * NULL times follow SQL comparison semantics (`l.t >= r.t` with a NULL
  * is false): left rows with NULL time are emitted with NULL payload,
  * right rows with NULL time can match nothing and are dropped — both
  * routed explicitly, never through the window sort. NULL join keys get
  * SQL equi-join semantics too (NULL never matches NULL — a window
  * partitionBy would group NULL keys together): left rows with any NULL
  * key go to the null-padded output, right rows with any NULL key are
  * dropped.
  *
  * Contract: `right` must be unique per (keys, time) — pre-aggregate ties
  * away (otherwise "the" as-of row is ill-defined) — and the payload
  * columns must be NON-NULL on right rows: each payload column is filled
  * independently, so a NULL inside a matched right row would be replaced
  * by a neighboring row's value (columns from different rows mixed).
  * Wrap nullable payloads in a struct column first. Rows of `left` whose
  * key has no qualifying right row get NULL payload (left-outer
  * semantics). Equal timestamps match: the right row sorts before the
  * left row at the same instant, mirroring DuckDB's `ASOF JOIN` on
  * `l.t >= r.t` (backward) / `l.t <= r.t` (forward).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame =
    unionAndFill(left, right, keys, leftTime, rightTime, payload, forward = false)

  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTime: String, rightTime: String,
              payload: Seq[String]): DataFrame =
    unionAndFill(left, right, keys, leftTime, rightTime, payload, forward = true)

  /** One body for both directions; they differ ONLY in the time sort
    * direction of the running window.
    */
  private def unionAndFill(left: DataFrame, right: DataFrame, keys: Seq[String],
                           leftTime: String, rightTime: String,
                           payload: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.mkString(",")} collide with left columns")
    require(!(leftCols ++ right.columns).exists(Set("__t", "__side")),
      "__t/__side are reserved working column names")
    val leftOnly = leftCols.filterNot(keys.contains)
    val ordered = (keys ++ Seq("__t", "__side") ++ leftOnly ++ payload).map(col)

    // NULL-time and NULL-key routing (see scaladoc): these rows never
    // enter the sort — SQL semantics, a NULL key or time matches nothing
    val anyKeyNull = keys.map(col(_).isNull).reduce(_ || _)
    val leftNullTime = left.where(col(leftTime).isNull || anyKeyNull)
    val l = payload
      .foldLeft(left.where(col(leftTime).isNotNull && !anyKeyNull)
        .withColumn("__t", col(leftTime)).withColumn("__side", lit(1))) {
        (d, p) => d.withColumn(p, lit(null))
      }
      .select(ordered: _*)
    val r = leftOnly
      .foldLeft(right.where(col(rightTime).isNotNull && !anyKeyNull)
        .select((keys.map(col) :+ col(rightTime).as("__t")) ++ payload.map(col): _*)
        .withColumn("__side", lit(0))) {
        (d, p) => d.withColumn(p, lit(null))
      }
      .select(ordered: _*)

    // scan toward the left row: time asc (backward) or desc (forward); at
    // equal times the right row (side 0) sorts first so it is in frame
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(if (forward) col("__t").desc else col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one Window node: same spec for every payload column (CollapseWindow)
    val filled = payload.foldLeft(l.unionByName(r)) { (d, p) =>
      d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    val joined = filled.where(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
    val nullPad = payload
      .foldLeft(leftNullTime) { (d, p) => d.withColumn(p, lit(null)) }
      .select((leftCols ++ payload).map(col): _*)
    joined.unionByName(nullPad)
  }
}
