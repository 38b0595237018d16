package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Distinct-count sketches (Apache DataSketches HLL, built into Spark):
  * the 100 TB path for COUNT(DISTINCT) — constant-size state per group,
  * and the partial sketches MERGE, so a distributed tree aggregation
  * produces the same estimate as one pass. No DuckDB oracle (its
  * approx_count_distinct is a different sketch); the gate here is the
  * algebraic property that makes the operator usable at scale.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("hll estimate near exact; per-shard sketches union to the global sketch") {
    val n = 7919L
    val df = spark.range(0, 50000).select((col("id") % n).as("k"))

    val global = df
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est"))
      .first().getLong(0)
    assert(math.abs(global - n) < n * 0.05, s"estimate $global vs exact $n")

    // distributed shape: shard → sketch per shard → union — must equal the
    // single-pass sketch exactly (same sketch state, not just close)
    val merged = df.withColumn("shard", col("k") % 16)
      .groupBy(col("shard")).agg(hll_sketch_agg(col("k")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .first().getLong(0)
    assert(merged == global)
  }

  test("approx quantiles: mergeable percentile_approx within rank error") {
    val df = spark.range(0, 100000).select(col("id").cast("double").as("x"))
    val q = df.agg(percentile_approx(col("x"), lit(0.5), lit(10000)).as("p50"))
      .first().getDouble(0)
    assert(math.abs(q - 50000.0) < 1000.0)
  }
}
