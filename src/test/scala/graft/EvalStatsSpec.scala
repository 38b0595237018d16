package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EvalStatsQueries

/** Round-6 eval wave: quantizer edge semantics (the oracle corpus has no
  * zero or constant vectors, so the guards need their own fixtures).
  */
class EvalStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("quantizeInt8: zero vector → scale 0, zero codes, mse 0") {
    val df = Seq((1L, Seq(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val got = EvalStatsQueries.quantizeInt8(df, "id", "v")
      .as[(Long, Double, Long, Long, Double)].first()
    assert(got == ((1L, 0.0, 0L, 0L, 0.0)))
  }

  test("quantizeInt8: max-magnitude element maps to ±127 exactly") {
    val df = Seq((1L, Seq(0.5f, -1.0f))).toDF("id", "v")
    val (_, scale, sum, mx, mse) = EvalStatsQueries.quantizeInt8(df, "id", "v")
      .as[(Long, Double, Long, Long, Double)].first()
    assert(scale == 127.0)
    // codes: round(0.5·127) = round(63.5) = 64 (ties away from zero),
    // round(−1·127) = −127 — the r10 round() quantizer: the negative
    // extreme lands EXACTLY on −127 (never −128, floor's edge case)
    assert(sum == 64L - 127L && mx == 64L)
    // max-magnitude element reconstructs exactly → only 0.5's error remains
    val err = 0.5 - 64.0 / 127.0
    assert(mse == err * err / 2.0)
  }

  test("quantizeInt8: codes stay in the int8 range on varied vectors") {
    val df = Seq(
      (1L, Seq(3.5f, -2.25f, 0.0f, 1.0f)),
      (2L, Seq(-0.001f, 0.0005f, 0.00025f, -0.0008f)))
      .toDF("id", "v")
    val rows = EvalStatsQueries.quantizeInt8(df, "id", "v")
      .as[(Long, Double, Long, Long, Double)].collect()
    rows.foreach { case (_, _, _, mx, mse) =>
      assert(mx <= 127L && mse >= 0.0)
    }
  }
}
