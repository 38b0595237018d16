package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val dir = "/root/testdata/sf0.001"

  test("nanos predicate rule: ts range filter pushes to the parquet scan") {
    val df = Tables.load(spark, dir, "events")
      .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
             col("ts") <  lit("2024-01-17 00:00:00").cast("timestamp"))
      .select(col("event_id"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,") && scan.contains("LessThan(ts,"),
      s"expected pushed raw-ns filters, plan:\n$scan")
  }

  test("nanos predicate rule: rewritten filter returns identical rows") {
    val base = Tables.load(spark, dir, "events")
    // compare against a filter shape the rule does NOT touch
    val expected = base
      .where(unix_micros(col("ts")).between(
        java.sql.Timestamp.valueOf("2024-01-10 00:00:00").getTime * 1000,
        java.sql.Timestamp.valueOf("2024-01-17 00:00:00").getTime * 1000 - 1))
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
    val got = base
      .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
             col("ts") <  lit("2024-01-17 00:00:00").cast("timestamp"))
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0)).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("nanos predicate rule: boundary semantics (<=, >, =) stay exact") {
    val base = Tables.load(spark, dir, "events").limit(50).cache()
    val anyTs = base.select(col("ts")).collect().head.getTimestamp(0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id").collect().map(_.getLong(0)).toSet
    // equality must match exactly one known row's truncated-µs timestamp
    val eq = ids(base.where(col("ts") === lit(anyTs)))
    assert(eq.nonEmpty)
    val le = ids(base.where(col("ts") <= lit(anyTs)))
    val gt = ids(base.where(col("ts") > lit(anyTs)))
    assert((le & gt).isEmpty && (le | gt) == ids(base))
    base.unpersist()
  }
}
