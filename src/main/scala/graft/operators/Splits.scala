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
}
