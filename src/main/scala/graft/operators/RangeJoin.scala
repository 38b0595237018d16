package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-window range join: all pairs with equal keys and
  * `right.time ∈ [left.time − window, left.time)` — the "events in the
  * preceding hour" shape.
  *
  * A plain inequality join plans as a nested-loop per key (O(|L|·|R|)
  * comparisons); with a time bound we can bin instead: bucket both sides
  * by the window width. A right row at time t can only pair with left rows
  * in bucket ⌊t/w⌋ or ⌊t/w⌋+1, so duplicating the RIGHT side into those
  * two buckets turns the range join into an equi-join on (keys, bucket)
  * followed by the exact range filter. Each qualifying pair appears in
  * exactly one bucket cell (the left row has a single bucket), so no
  * dedup pass is needed.
  *
  * Scale shape: one shuffle on (keys, bucket); candidates are bounded by
  * 2× the per-window row density, not by table size — the standard
  * interval-binning plan for temporal joins at 100 TB. Hot (key, bucket)
  * cells can be salted like any equi-join key.
  *
  * Contract: `leftTime` and `rightTime` must be distinct column names
  * (rename before calling); both sides keep all their columns in the
  * output pairs.
  */
object RangeJoin {

  def recentPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  windowMicros: Long): DataFrame = {
    require(leftTime != rightTime, "rename the time columns apart first")
    val lb = left.withColumn("__b",
      floor(unix_micros(col(leftTime)) / windowMicros))
    val rb = right
      .withColumn("__b0", floor(unix_micros(col(rightTime)) / windowMicros))
      .withColumn("__b", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    lb.join(rb, keys :+ "__b")
      .where(unix_micros(col(rightTime)) >= unix_micros(col(leftTime)) - windowMicros &&
             unix_micros(col(rightTime)) <  unix_micros(col(leftTime)))
      .drop("__b")
  }
}
