package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without a single-partition window — the sharded
  * prefix-sum pattern: range-partition by the sort keys, rank WITHIN each
  * partition (a partitioned window — parallel, spill-safe), then add the
  * per-partition row-count prefix sums (a bounded driver-side collect of
  * one count per partition, like `stats_equidepth_histogram`'s boundary
  * probes). `Window.orderBy` with no partition spec serializes the whole
  * input through ONE task — fine for a post-aggregate of bounded key
  * cardinality, a scale-killer for per-entity tables (customers, users,
  * documents) that grow with the corpus.
  *
  * The partitioned input is `localCheckpoint`ed before the offsets job:
  * range partitioning samples its bounds, so an unpinned plan could
  * repartition DIFFERENTLY between the count job and the main job and
  * misalign the offsets.
  *
  * Requirement: `sortCols` must be a TOTAL order (include a unique
  * tiebreaker) — ties crossing a range-partition boundary would otherwise
  * make the rank depend on the sampled bounds.
  */
object GlobalRank {

  /** Core: `df` + `outCol` = the 1-based global row number, PLUS the
    * total row count (free — it's the sum of the per-partition counts
    * the offsets job already collected, so ntile needs no second pass).
    */
  private def rankedWithCount(df: DataFrame, sortCols: Seq[Column],
                              outCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parted = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    // offset of partition i = total rows in partitions before it
    val offsets = {
      var acc = 0L
      counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val ranked = parted
      .withColumn("__lrn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)))
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn", "__off")
    (ranked, counts.map(_._2).sum)
  }

  /** `df` + `outCol` = the 1-based global row number under `sortCols`. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      outCol: String): DataFrame =
    rankedWithCount(df, sortCols, outCol)._1

  /** As [[globalRowNumber]], also returning the total row count (free —
    * the sum of the per-partition counts the offsets job collected).
    * Prefix-doubling callers use it to size the next round's label
    * universe without a second count job.
    */
  def globalRowNumberWithCount(df: DataFrame, sortCols: Seq[Column],
                               outCol: String): (DataFrame, Long) =
    rankedWithCount(df, sortCols, outCol)

  /** `df` + `outCol` = the GLOBAL DENSE RANK of `keys` (1-based; equal
    * keys share a label, labels are order-correct and contiguous),
    * computed IN PLACE — no separate distinct + re-join: range-partition
    * by the keys (equal keys land in one partition by construction),
    * per-partition dense_rank, then add per-partition DISTINCT-count
    * prefix offsets (bounded collect). One shuffle + one partitioned
    * window per call, versus the three shuffles of
    * distinct → sort-assign → join-back — the prefix-doubling densify
    * step's cost is this function, ⌈log₂ L⌉ times.
    *
    * Returns (labeled df, total distinct key count) — the count is free
    * (the offsets sum) and is the doubling loop's termination signal.
    */
  def withDenseRank(df: DataFrame, keys: Seq[Column],
                    outCol: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    // rank FIRST, pin the ranked rows, and read each partition's
    // distinct-key count as max(dense_rank) off the pinned frame — the
    // previous shape checkpointed before the window and ran a SEPARATE
    // count_distinct(struct(keys)) aggregation over the full table for
    // the offsets (a per-partition hash map of every key, rebuilt once
    // per densify round; the max() probe is a trivial scan). Ranks and
    // counts are unchanged: within a partition max(dense_rank) IS the
    // distinct count, and the range partitioner still colocates equal
    // keys.
    val ranked = df.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__ldr", dense_rank().over(
        Window.partitionBy(col("__pid")).orderBy(keys: _*)))
      .localCheckpoint()
    val counts = ranked.groupBy(col("__pid"))
      .agg(max(col("__ldr")).cast("long").as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = {
      var acc = 0L
      counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val labeled = ranked
      .join(broadcast(offDf), Seq("__pid"))
      .withColumn(outCol, col("__off") + col("__ldr"))
      .drop("__pid", "__ldr", "__off")
    (labeled, counts.map(_._2).sum)
  }

  /** `df` + `outCol` = NTILE(buckets) under `sortCols`, replicating the
    * standard semantics shared by Spark and DuckDB: with n rows,
    * q = n / buckets and r = n % buckets, the first r buckets hold q+1
    * rows and the rest q — computed from the sharded global row number,
    * never a partition-less window. The row count comes free from the
    * offsets collect, so the whole op is one checkpoint + one
    * partitioned window + one broadcast join.
    */
  def shardedNtile(df: DataFrame, buckets: Int, sortCols: Seq[Column],
                   outCol: String): DataFrame = {
    val rn = "__ntile_rn"
    val (ranked, n) = rankedWithCount(df, sortCols, rn)
    val q = n / buckets
    val r = n % buckets
    val cut = r * (q + 1)
    val tile =
      if (q == 0) col(rn) // fewer rows than buckets: bucket i = row i
      else when(col(rn) <= cut, (col(rn) - 1) / (q + 1) + 1)
        .otherwise(lit(r) + (col(rn) - cut - 1) / q + 1)
    ranked.withColumn(outCol, tile.cast("int")).drop(rn)
  }
}
