package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test split assignment for training-data
  * pipelines: bucket = int(first 8 hex chars of md5(key)) mod `buckets`.
  *
  * Properties that matter at 100 TB:
  *  - data-independent and stable: a document keeps its split across runs,
  *    re-shards, and engine changes (md5 is portable — the DuckDB oracle
  *    computes the identical assignment);
  *  - no shuffle and no coordination: a narrow map stage, no sampling
  *    state, no seed distribution problem;
  *  - composable: filter `split = 'train'` pushes down like any predicate.
  */
object Splits {

  def bucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("bigint") % buckets

  /** Adds `splitCol` ∈ {train, val, test} with the given percentages. */
  def withSplit(df: DataFrame, keyCol: String, trainPct: Int = 90,
                valPct: Int = 5, splitCol: String = "split"): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be <= 100")
    val b = bucket(col(keyCol))
    df.withColumn(splitCol,
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic corpus shuffle for training order: shard + position
    * assigned from `md5(seed : key)` — a seeded pseudo-random permutation
    * with the same scale properties as [[bucket]] (data-independent,
    * engine-portable, reproducible across runs and re-shards, no global
    * sort). The position window partitions BY SHARD, so no task ever
    * orders more than one shard (~corpus/shards rows) — the global
    * `ORDER BY rand()` it replaces is a single total sort of the corpus.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: String,
                           shards: Int): DataFrame = {
    val k = md5(concat(lit(seed), lit(":"), col(keyCol).cast("string")))
    val shard = (conv(substring(k, 1, 8), 16, 10).cast("bigint") % shards)
      .cast("int")
    df.withColumn("__shuf", k)
      .withColumn("shard", shard)
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("__shuf"), col(keyCol))))
      .drop("__shuf")
  }
}
