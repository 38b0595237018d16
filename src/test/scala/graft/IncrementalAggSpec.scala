package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalAgg, Warehouse}
import graft.operators.IncrementalAgg.{Add, Max, Min}

/** Delta-maintained standing aggregates ≡ recompute-from-scratch, for any
  * batch split — the merge is a monoid fold over partials.
  */
class IncrementalAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val merges = Map("n" -> (Add: IncrementalAgg.Merge),
    "total" -> Add, "lo" -> Min, "hi" -> Max)

  private def partial(df: DataFrame): DataFrame =
    df.groupBy("user").agg(
      count(lit(1)).as("n"), sum(col("v")).as("total"),
      min(col("v")).as("lo"), max(col("v")).as("hi"))

  private def rowsOf(df: DataFrame) =
    df.orderBy("user").as[(String, Long, Long, Long, Long)].collect().toSeq

  test("three delta refreshes equal one full recompute") {
    val dir = java.nio.file.Files.createTempDirectory("graft-incr-wh").toString
    val wh = new Warehouse(spark, dir)
    val b1 = Seq(("a", 3L), ("a", 5L), ("b", 10L)).toDF("user", "v")
    val b2 = Seq(("b", 1L), ("c", 7L)).toDF("user", "v")
    val b3 = Seq(("a", 100L)).toDF("user", "v")
    for (b <- Seq(b1, b2, b3))
      IncrementalAgg.refresh(wh, "totals", b, Seq("user"), merges)(partial)
    val scratch = partial(b1.union(b2).union(b3))
    assert(rowsOf(wh.read("totals")) == rowsOf(scratch))
  }

  test("merge is split-invariant: any batching yields the same table") {
    val all = Seq(("a", 3L), ("a", 5L), ("b", 10L), ("b", 1L), ("c", 7L), ("a", 100L))
    val expected = rowsOf(partial(all.toDF("user", "v")))
    for (cut1 <- 1 until all.length; cut2 <- cut1 until all.length) {
      val parts = Seq(all.slice(0, cut1), all.slice(cut1, cut2), all.slice(cut2, all.length))
        .filter(_.nonEmpty).map(_.toDF("user", "v"))
      val folded = parts.map(partial).reduce(
        IncrementalAgg.applyDelta(_, _, Seq("user"), merges))
      assert(rowsOf(folded) == expected, s"split at ($cut1, $cut2) diverged")
    }
  }

  test("delta-only keys bootstrap; existing-only keys pass through") {
    val e = Seq(("a", 1L, 10L, 10L, 10L)).toDF("user", "n", "total", "lo", "hi")
    val d = Seq(("b", 2L, 5L, 2L, 3L)).toDF("user", "n", "total", "lo", "hi")
    val out = rowsOf(IncrementalAgg.applyDelta(e, d, Seq("user"), merges))
    assert(out == Seq(("a", 1L, 10L, 10L, 10L), ("b", 2L, 5L, 2L, 3L)))
  }

  test("reserved working names rejected; output order is existing-schema order") {
    val e = Seq(("a", 1L)).toDF("user", "n")
    val clash = Seq(("a", 1L, true)).toDF("user", "n", "__d_present")
    intercept[IllegalArgumentException] {
      IncrementalAgg.applyDelta(e, clash, Seq("user"), Map("n" -> Add))
    }
    // 5 maintained columns (past HashMap's 4-entry insertion stability):
    // output must follow the existing schema's column order regardless of
    // the Map's iteration order
    val cols = Seq("m1", "m2", "m3", "m4", "m5")
    val wide = Seq(("a", 1L, 2L, 3L, 4L, 5L)).toDF("user" +: cols: _*)
    val m = cols.map(_ -> (Add: IncrementalAgg.Merge)).toMap
    val out = IncrementalAgg.applyDelta(wide, wide, Seq("user"), m)
    assert(out.columns.toSeq == "user" +: cols)
  }

  test("weighted deltas: retractions subtract; fully-retracted keys drop") {
    // standing: a → (2 rows, total 30); b → (1 row, total 5)
    val standing = Seq(("a", 2L, 30L), ("b", 1L, 5L)).toDF("user", "n", "total")
    // delta: insert (a, 12); retract one (a, 10) row; retract b entirely
    val delta = Seq(
      ("a", 12L, 1L), ("a", 10L, -1L), ("b", 5L, -1L))
      .toDF("user", "total", "w")
    val part = IncrementalAgg.weightedPartial(delta, Seq("user"), "w",
      Seq("total"))
    val merged = IncrementalAgg.applyDelta(standing, part, Seq("user"),
      Map("n" -> Add, "total" -> Add))
    val out = IncrementalAgg.dropDeadKeys(merged)
      .as[(String, Long, Long)].collect().toSeq.sorted
    // a: n 2+1−1 = 2, total 30+12−10 = 32; b: n 1−1 = 0 → dropped
    assert(out == Seq(("a", 2L, 32L)))
  }

  test("weighted deltas: a key can retract below standing and re-insert") {
    val standing = Seq(("k", 1L, 7L)).toDF("user", "n", "total")
    val d1 = Seq(("k", 7L, -1L)).toDF("user", "total", "w")
    val gone = IncrementalAgg.dropDeadKeys(
      IncrementalAgg.applyDelta(standing,
        IncrementalAgg.weightedPartial(d1, Seq("user"), "w", Seq("total")),
        Seq("user"), Map("n" -> Add, "total" -> Add)))
    assert(gone.count() == 0)
    val d2 = Seq(("k", 9L, 1L)).toDF("user", "total", "w")
    val back = IncrementalAgg.applyDelta(gone,
      IncrementalAgg.weightedPartial(d2, Seq("user"), "w", Seq("total")),
      Seq("user"), Map("n" -> Add, "total" -> Add))
      .as[(String, Long, Long)].collect().toSeq
    assert(back == Seq(("k", 1L, 9L)))
  }
}
