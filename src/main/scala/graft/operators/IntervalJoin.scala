package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed interval-overlap join: pairs (l, r) with the same key whose
  * closed intervals [lStart,lEnd] and [rStart,rEnd] intersect
  * (lStart <= rEnd AND rStart <= lEnd).
  *
  * Spark-first plan: the naive formulation is an inequality theta-join —
  * Spark can only execute it as a broadcast nested loop (or worse, a
  * cartesian) whose candidate set is |L|·|R| per key. Instead both sides
  * are binned on a time grid of `binMicros` and replicated to every bin
  * their interval covers, turning the predicate into an equi-join on
  * (key, bin) that hash-partitions and scales linearly with per-bin
  * density. Each overlapping pair co-occurs in every bin their
  * intersection covers; rather than a global `distinct` (a second wide
  * shuffle over all candidate pairs), a pair is kept only in the FIRST
  * bin of the intersection — bin == max(floor(lStart/w), floor(rStart/w))
  * — which each candidate row can check locally, so dedup is a narrow
  * filter.
  *
  * Pick `binMicros` ≈ the typical interval width: replication factor is
  * 1 + width/bin per row (bounded, data-independent), and at 100 TB the
  * only wide stage is the single (key, bin) shuffle, which AQE can
  * re-split on skewed bins.
  */
object IntervalJoin {

  /** @param left  columns: keys ++ [lStart, lEnd] (timestamp)
    * @param right columns: keys ++ [rStart, rEnd] (timestamp); all other
    *              columns from both sides pass through.
    */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
              lStart: String, lEnd: String, rStart: String, rEnd: String,
              binMicros: Long): DataFrame = {
    require(binMicros > 0, "binMicros must be positive")
    def bins(s: String, e: String): Column =
      sequence(floor(unix_micros(col(s)) / binMicros),
        floor(unix_micros(col(e)) / binMicros))

    val l = left.withColumn("__bin", explode(bins(lStart, lEnd)))
    val r = right.withColumn("__bin", explode(bins(rStart, rEnd)))
    val joined = l.join(r, keys :+ "__bin")
    val firstSharedBin = greatest(
      floor(unix_micros(col(lStart)) / binMicros),
      floor(unix_micros(col(rStart)) / binMicros))
    joined
      .where(col("__bin") === firstSharedBin)
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bin")
  }
}
