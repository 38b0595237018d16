package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TimeFns
import graft.pipeline.Incremental

/** Backfill cadence (calendar-month windows from the 2025-01-01 epoch,
  * ASC) and lake schema evolution (mergeSchema over files written with
  * different column sets — the 100 TB reality of a long-lived table).
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("backfill months: epoch through a mid-month date, inclusive ASC windows") {
    val months = Incremental.backfillMonths(until = LocalDate.of(2025, 3, 15))
    assert(months == Seq(
      (Timestamp.valueOf("2025-01-01 00:00:00"), Timestamp.valueOf("2025-01-31 23:59:59")),
      (Timestamp.valueOf("2025-02-01 00:00:00"), Timestamp.valueOf("2025-02-28 23:59:59")),
      (Timestamp.valueOf("2025-03-01 00:00:00"), Timestamp.valueOf("2025-03-31 23:59:59"))))
    // caller-supplied start mid-month snaps to its month start
    val custom = Incremental.backfillMonths(
      from = LocalDate.of(2025, 5, 20), until = LocalDate.of(2025, 5, 21))
    assert(custom == Seq(
      (Timestamp.valueOf("2025-05-01 00:00:00"), Timestamp.valueOf("2025-05-31 23:59:59"))))
  }

  test("month window columns match the driver-side arithmetic (leap month)") {
    val got = Seq("2024-02-17 13:14:15").toDF("s")
      .select(
        TimeFns.monthWindowStart(col("s").cast("timestamp")).as("ws"),
        TimeFns.monthWindowEnd(col("s").cast("timestamp")).as("we"))
      .as[(Timestamp, Timestamp)].collect().head
    assert(got == (Timestamp.valueOf("2024-02-01 00:00:00"),
      Timestamp.valueOf("2024-02-29 23:59:59")))
  }

  test("parquet schema evolution: mergeSchema unions columns, old files null-fill") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    spark.range(0, 10).select(col("id"), lit("v1").as("a"))
      .write.mode("append").parquet(dir)
    spark.range(10, 20).select(col("id"), lit("v2").as("a"), (col("id") * 2).as("b"))
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "id"))
    assert(merged.count() == 20)
    assert(merged.where(col("b").isNull).count() == 10) // v1 files null-fill b
    assert(merged.where(col("b") === 30).select("a").as[String].collect().head == "v2")
  }
}
