package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ApproxCountDistinctRewrite

/** The approx-mode optimizer rule: one conf flips every exact
  * count(DISTINCT x) into HLL++ — and back.
  */
class ApproxModeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def q() = Tables.load(spark, dir, "events")
    .groupBy(col("event_type"))
    .agg(countDistinct(col("user_id")).as("n_users"))

  test("flag off: exact count-distinct, plan untouched") {
    val df = q()
    assert(!df.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
  }

  test("flag on: rewritten to HLL++, estimate within the rsd envelope") {
    val exact = q().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    spark.conf.set(ApproxCountDistinctRewrite.EnabledKey, "true")
    try {
      val df = q()
      assert(df.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"),
        s"rule did not fire:\n${df.queryExecution.optimizedPlan.toString.take(400)}")
      val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet)
      for ((k, e) <- exact) {
        val a = approx(k)
        // HLL++ with rsd=0.05: 6 sigma is a generous determinism-safe bound
        assert(math.abs(a - e) <= math.max(3.0, 0.30 * e),
          s"$k: approx $a too far from exact $e")
      }
      // SQL text path rewrites the same way
      Tables.load(spark, dir, "events").createOrReplaceTempView("approx_ev_v")
      val sql = spark.sql("SELECT count(DISTINCT user_id) AS n FROM approx_ev_v")
      assert(sql.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      // guards: FILTER-clause and multi-arg distinct aggs stay exact
      val guarded = spark.sql(
        "SELECT count(DISTINCT user_id) FILTER (WHERE user_id > 0) AS a, " +
        "count(DISTINCT user_id, event_type) AS b FROM approx_ev_v")
      assert(!guarded.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    } finally spark.conf.unset(ApproxCountDistinctRewrite.EnabledKey)
  }

  test("flag restored: exactness back") {
    val df = q()
    assert(!df.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
  }
}
