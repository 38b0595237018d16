package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified Bernoulli sampling for training-data curation:
  * keep a row iff `md5(stratum ":" key) mod 100 < pct(stratum)` — e.g.
  * downsample boilerplate web text hard, keep rare languages at 100%.
  *
  * Like [[Splits]], the decision is a pure function of the row: stable
  * across runs, re-shards, and engines (the DuckDB oracle computes the
  * identical predicate), needs no seed distribution or sampling state,
  * and is a narrow filter — no shuffle, pushes down like any predicate.
  * Seeding the hash with the stratum name decorrelates it from other
  * md5-derived assignments on the same key (a row's split bucket and its
  * sample bucket are independent).
  */
object Sampling {

  def sampleBucket(strata: Column, key: Column): Column =
    conv(substring(md5(concat(strata, lit(":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("bigint") % 100

  /** Filter to the per-stratum percentages in `pct`; strata not listed
    * keep `defaultPct` percent.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           pct: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require((pct.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "percentages must be in [0, 100]")
    val rate = pct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(sampleBucket(col(strataCol), col(keyCol)) < rate)
  }
}
