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

  // ---- portable md5-prefix sketches (graft.functions.SketchFns) -------

  import graft.functions.SketchFns

  test("portable HLL: estimate within m=512 error bound; duplicates don't move it") {
    val n = 20000L
    val df = spark.range(0, n).select(col("id"))
    def estimate(d: org.apache.spark.sql.DataFrame): Double = {
      val h = SketchFns.hash60(col("id"))
      val regs = d.select(SketchFns.hllBucket(h).as("bucket"),
          SketchFns.hllRho(SketchFns.hllRem(h)).as("rho"))
        .groupBy("bucket").agg(max(col("rho")).as("maxrho"))
      regs.agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - maxrho)")).as("sp"),
          count(lit(1)).as("nb"))
        .select(SketchFns.hllEstimate(col("sp"), col("nb")).as("e"))
        .first().getDouble(0)
    }
    val e = estimate(df)
    // standard error ~1.04/sqrt(512) = 4.6%; allow 4 sigma
    assert(math.abs(e - n) < n * 0.19, s"estimate $e vs exact $n")
    // multiset-insensitive: the registers are max-aggregated
    assert(estimate(df.union(df)) == e)
  }

  test("portable HLL rho: branch chain equals leading-zero arithmetic") {
    val rows = spark.range(0, 2000).select(
      (col("id") * 2654435761L % (1L << SketchFns.HllRemBits)).as("rem"))
    val got = rows.select(col("rem"), SketchFns.hllRho(col("rem")).as("rho"))
      .collect()
    got.foreach { r =>
      val rem = r.getLong(0)
      val expected =
        if (rem == 0) SketchFns.HllRemBits + 1
        else java.lang.Long.numberOfLeadingZeros(rem) - (64 - SketchFns.HllRemBits) + 1
      assert(r.getInt(1) == expected, s"rem=$rem")
    }
  }

  test("portable CMS: overestimate-only, exact when no cell collision") {
    import spark.implicits._
    val ev = Seq.tabulate(3000)(i => (i % 37, 1)).toDF("k", "one")
    val sketch = ev.select(col("k"), explode(sequence(lit(0), lit(3))).as("j"))
      .groupBy(col("j"), SketchFns.cmsCell(col("j"), col("k"), 256).as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val exact = ev.groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
    val probed = exact
      .select(col("k"), col("n_exact"), explode(sequence(lit(0), lit(3))).as("j"))
      .withColumn("cell", SketchFns.cmsCell(col("j"), col("k"), 256))
      .join(broadcast(sketch), Seq("j", "cell"))
      .groupBy(col("k"), col("n_exact")).agg(min(col("cnt")).as("n_est"))
      .collect()
    assert(probed.length == 37)
    probed.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    // 37 keys in 256 cells × 4 rows: the min over rows is exact unless a
    // key collides in ALL four rows — verify most keys resolve exactly
    assert(probed.count(r => r.getLong(2) == r.getLong(1)) >= 30)
  }
}
