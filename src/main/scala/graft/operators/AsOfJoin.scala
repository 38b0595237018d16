package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single most recent
  * right row with the same key and `right.time <= left.time` (inclusive).
  *
  * Spark has no ASOF JOIN operator. The textbook formulations are a range
  * join (candidate explosion, then a per-left-row argmax — two wide
  * stages) or broadcasting the whole right side (dies when the right side
  * is a fact table). This is the union-and-fill plan instead: tag both
  * sides, union them, and forward-fill the right payload with
  * `last(payload, ignoreNulls)` over one (key, time)-ordered window.
  *
  * Scale shape: cost is ONE shuffle of |left| + |right| rows and zero
  * candidate blow-up; the window sort partitions by the join key, so the
  * plan parallelizes per key group and skew tooling (salting by key)
  * composes. At 100 TB this is the same shape databases use for
  * merge-based ASOF — no stage materializes more rows than its input.
  *
  * Contract: `right` must be unique per (keys, time); pre-aggregate ties
  * away (otherwise "the" as-of row is ill-defined). Rows of `left` whose
  * key has no earlier right row get NULL payload (left-outer semantics).
  * Equal timestamps match: the right row sorts before the left row at the
  * same instant, mirroring DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.mkString(",")} collide with left columns")
    val leftOnly = leftCols.filterNot(keys.contains)
    val ordered = (keys ++ Seq("__t", "__side") ++ leftOnly ++ payload).map(col)

    val l = payload
      .foldLeft(left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))) {
        (d, p) => d.withColumn(p, lit(null))
      }
      .select(ordered: _*)
    val r = leftOnly
      .foldLeft(right
        .select((keys.map(col) :+ col(rightTime).as("__t")) ++ payload.map(col): _*)
        .withColumn("__side", lit(0))) {
        (d, p) => d.withColumn(p, lit(null))
      }
      .select(ordered: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one Window node: same spec for every payload column (CollapseWindow)
    val filled = payload.foldLeft(l.unionByName(r)) { (d, p) =>
      d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1)
      .select((leftCols ++ payload).map(col): _*)
  }
}
