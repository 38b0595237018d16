package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native session_window boundary rule the
  * `session_window_native` oracle depends on: an event at exactly
  * prev + gap is MERGED into the session (a new session starts only when
  * the silence is strictly greater than the gap) — the same rule as the
  * lag-based islands formulation, so the two stay interchangeable.
  */
class SessionWindowBoundarySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("session_window: exact-gap event merges; >gap starts a new session") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00")), // exactly gap
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"))  // gap + 30min
    ).toDF("user_id", "ts")
    val got = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n")).select("n").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }
}
