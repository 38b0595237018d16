package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IntervalJoin

/** The binned interval-overlap plan must return exactly the naive
  * theta-join's pair set — same pairs, each exactly once — for any bin
  * width, including intervals spanning many bins and boundary-touching
  * intervals (closed-interval semantics).
  */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def mkIntervals(name: String, rows: Seq[(Int, Long, Long)]) =
    rows.toDF("key", "s_us", "e_us")
      .select(col("key"), col(s"s_us").as(s"${name}_id"),
        timestamp_micros(col("s_us")).as(s"${name}_s"),
        timestamp_micros(col("e_us")).as(s"${name}_e"))

  // deterministic pseudo-random intervals, widths 0..90s, over a 1h axis
  private def gen(seed: Int, n: Int): Seq[(Int, Long, Long)] =
    (0 until n).map { i =>
      val x = (i * 2654435761L + seed * 40503L) % 3600000000L
      val w = (i * 48271L + seed) % 90000000L
      (i % 5, x.abs, x.abs + w.abs)
    }

  private def naive(l: org.apache.spark.sql.DataFrame,
                    r: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    l.join(r, l("key") === r("key") &&
        l("l_s") <= r("r_e") && r("r_s") <= l("l_e"))
      .select(col("l_id"), col("r_id"))
      .as[(Long, Long)].collect().toSet

  test("binned overlap ≡ theta join, each pair exactly once, any bin width") {
    val l = mkIntervals("l", gen(1, 120))
    val r = mkIntervals("r", gen(2, 150))
    val expected = naive(l, r)
    assert(expected.nonEmpty)
    for (binUs <- Seq(1000000L, 30000000L, 3600000000L)) {
      val got = IntervalJoin.overlap(l, r, Seq("key"),
          "l_s", "l_e", "r_s", "r_e", binUs)
        .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSeq
      assert(got.toSet == expected, s"bin=$binUs pair set")
      assert(got.size == expected.size, s"bin=$binUs duplicates")
    }
  }

  test("closed-interval boundaries: touching endpoints match; disjoint don't") {
    val l = mkIntervals("l", Seq((1, 0L, 1000000L)))
    val r = mkIntervals("r", Seq(
      (1, 1000000L, 2000000L),   // touches l's end exactly → overlap
      (1, 1000001L, 2000000L),   // 1µs past → no overlap
      (2, 0L, 1000000L)))        // different key → no overlap
    val got = IntervalJoin.overlap(l, r, Seq("key"),
        "l_s", "l_e", "r_s", "r_e", 500000L)
      .select(col("r_id")).as[Long].collect().toSeq
    assert(got == Seq(1000000L))
  }
}
