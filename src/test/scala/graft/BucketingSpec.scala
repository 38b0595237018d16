package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bucketing

/** Co-located joins/aggregations over bucketed tables must run with NO
  * Exchange on the bucketed sides — the physical proof that the layout
  * amortizes the shuffle.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed equi-join on the bucket key plans without Exchange") {
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bspec_a", "k", 4)
    Bucketing.writeBucketed(b, "bspec_b", "k", 4)
    val joined = spark.sessionState.conf
    // force a non-broadcast join so the distribution requirement is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.read(spark, "bspec_a")
        .join(Bucketing.read(spark, "bspec_b"), "k")
      assert(j.count() == 1000)
      val plan = planOf(j)
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("aggregation on the bucket key plans without Exchange") {
    val df = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
    Bucketing.writeBucketed(df, "bspec_g", "k", 4)
    val agg = Bucketing.read(spark, "bspec_g").groupBy("k")
      .agg(sum("v").as("s"))
    assert(agg.count() == 50)
    assert(!planOf(agg).contains("Exchange"))
  }

  test("join on a NON-bucket key still shuffles (sanity inverse)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.read(spark, "bspec_a").alias("l")
        .join(Bucketing.read(spark, "bspec_b").alias("r"),
          col("l.va") === concat(lit("a"), col("r.k").cast("string")))
      assert(planOf(j).contains("Exchange"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
