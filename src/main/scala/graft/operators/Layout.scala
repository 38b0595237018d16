package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning: Z-order (Morton) interleaving
  * of several numeric dimensions, then range-partition + sort by the
  * z-value before writing. Parquet keeps per-file/row-group min-max stats;
  * clustering on the z-curve makes those stats TIGHT on every clustered
  * dimension at once, so point/range predicates on any of them prune most
  * files — the difference between scanning 100 TB and scanning 100 GB for
  * a selective multi-dimension query.
  *
  * Spark-first shape: the z-value is a pure column expression (codegen'd
  * bit interleave), normalization bounds come from ONE small aggregate
  * broadcast into the projection (no rank window — a global rank would
  * serialize the table through one task), and the physical clustering is
  * `repartitionByRange(z)` + `sortWithinPartitions(z)` — Spark's sampling
  * range partitioner does the histogram work.
  */
object Layout {

  val BitsPerDim = 16

  /** Morton-interleaved z-value of the given (normalized-to-16-bit)
    * dimension columns: bit b of dim i lands at position b*k + i.
    */
  def interleave(dims: Seq[Column]): Column = {
    val k = dims.size
    require(k >= 1 && k * BitsPerDim <= 62, s"up to ${62 / BitsPerDim} dims")
    val terms = for {
      b <- 0 until BitsPerDim
      (d, i) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ + _)
  }

  /** Scales a numeric column into [0, 65535] with min/max bounds. */
  def normalize(c: Column, minC: Column, maxC: Column): Column = {
    val span = maxC.cast("double") - minC.cast("double")
    when(span <= 0.0, lit(0L)).otherwise(
      least(lit((1L << BitsPerDim) - 1),
        floor((c.cast("double") - minC.cast("double")) / span
          * ((1L << BitsPerDim) - 1)).cast("long")))
  }

  /** Returns `df` clustered on the z-curve of `dimCols` into `numFiles`
    * output partitions (write each partition as one file). Adds no
    * columns; rows are unchanged, only their physical order moves.
    */
  def zOrder(df: DataFrame, dimCols: Seq[String], numFiles: Int): DataFrame = {
    val bounds = df.agg(
      min(col(dimCols.head)).as(s"__min0"),
      (dimCols.tail.zipWithIndex.flatMap { case (c, i) =>
        Seq(min(col(c)).as(s"__min${i + 1}"), max(col(c)).as(s"__max${i + 1}"))
      } :+ max(col(dimCols.head)).as(s"__max0")): _*)
    val withZ = df.crossJoin(broadcast(bounds))
      .withColumn("__z", interleave(dimCols.zipWithIndex.map { case (c, i) =>
        normalize(col(c), col(s"__min$i"), col(s"__max$i"))
      }))
    withZ.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop((0 until dimCols.size).flatMap(i => Seq(s"__min$i", s"__max$i")) :+ "__z": _*)
  }
}
