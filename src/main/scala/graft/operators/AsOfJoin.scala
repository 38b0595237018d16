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
  * sides, union them, and fill the right payload directionally with
  * `last`/`first(payload, ignoreNulls)` over one (key, time)-ordered
  * window.
  *
  * Scale shape: cost is ONE shuffle of |left| + |right| rows and zero
  * candidate blow-up; the window sort partitions by the join key, so the
  * plan parallelizes per key group and skew tooling (salting by key)
  * composes. At 100 TB this is the same shape databases use for
  * merge-based ASOF — no stage materializes more rows than its input.
  *
  * Contract: `right` must be unique per (keys, time) — pre-aggregate ties
  * away (otherwise "the" as-of row is ill-defined) — and the payload
  * columns must be NON-NULL on right rows: each payload column is filled
  * independently, so a NULL inside a matched right row would be replaced
  * by a neighboring row's value (columns from different rows mixed).
  * Wrap nullable payloads in a struct column first. Rows of `left` whose
  * key has no qualifying right row get NULL payload (left-outer
  * semantics). Equal timestamps match: the right row sorts toward the
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

  /** One body for both directions; they differ only in which side sorts
    * first at equal times, the frame direction, and first-vs-last fill.
    */
  private def unionAndFill(left: DataFrame, right: DataFrame, keys: Seq[String],
                           leftTime: String, rightTime: String,
                           payload: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.mkString(",")} collide with left columns")
    val leftOnly = leftCols.filterNot(keys.contains)
    val ordered = (keys ++ Seq("__t", "__side") ++ leftOnly ++ payload).map(col)
    // at equal __t the RIGHT row must sort toward the left row's frame:
    // before it (backward, side 0 < 1) or after it (forward, 1 > 0)
    val (leftTag, rightTag) = if (forward) (0, 1) else (1, 0)

    val l = payload
      .foldLeft(left.withColumn("__t", col(leftTime)).withColumn("__side", lit(leftTag))) {
        (d, p) => d.withColumn(p, lit(null))
      }
      .select(ordered: _*)
    val r = leftOnly
      .foldLeft(right
        .select((keys.map(col) :+ col(rightTime).as("__t")) ++ payload.map(col): _*)
        .withColumn("__side", lit(rightTag))) {
        (d, p) => d.withColumn(p, lit(null))
      }
      .select(ordered: _*)

    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
    val w = if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def fill(c: org.apache.spark.sql.Column) =
      if (forward) first(c, ignoreNulls = true) else last(c, ignoreNulls = true)
    // one Window node: same spec for every payload column (CollapseWindow)
    val filled = payload.foldLeft(l.unionByName(r)) { (d, p) =>
      d.withColumn(p, fill(col(p)).over(w))
    }
    filled.where(col("__side") === leftTag)
      .select((leftCols ++ payload).map(col): _*)
  }
}
