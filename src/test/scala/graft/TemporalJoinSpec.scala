package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, RangeJoin, Sampling}

/** AsOfJoin / RangeJoin / Sampling semantics, proved against the naive
  * formulations they replace at scale.
  */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (id, key, t) — interleaved with ties and keys that never match
  private def leftDf: DataFrame =
    Seq((1L, "a", 100L), (2L, "a", 250L), (3L, "a", 300L), (4L, "b", 50L),
      (5L, "b", 500L), (6L, "c", 10L))
      .toDF("id", "key", "t_us")
      .withColumn("lt", timestamp_micros(col("t_us"))).drop("t_us")

  private def rightDf: DataFrame =
    Seq((101L, "a", 100L, 1.0), (102L, "a", 200L, 2.0), (103L, "a", 301L, 3.0),
      (104L, "b", 400L, 4.0), (105L, "d", 1L, 5.0))
      .toDF("rid", "key", "t_us", "rv")
      .withColumn("rt", timestamp_micros(col("t_us"))).drop("t_us")

  test("as-of backward ≡ range-join + argmax, inclusive at equal time") {
    val got = AsOfJoin.backward(leftDf, rightDf, Seq("key"), "lt", "rt",
      Seq("rid", "rv")).select("id", "rid", "rv")

    // naive: candidate range join, per-left argmax, left-outer re-attach
    val matched = leftDf.join(rightDf, Seq("key"))
      .where(col("rt") <= col("lt"))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("rt").desc)))
      .where(col("__rn") === 1)
      .select(col("id"), col("rid"), col("rv"))
    val naiveAll = leftDf.select(col("id")).join(matched, Seq("id"), "left")
      .select("id", "rid", "rv")

    assert(got.orderBy("id").collect().toSeq ==
      naiveAll.orderBy("id").collect().toSeq)
    val byId = got.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(byId(1L) == (Some(101L), Some(1.0)))  // equal time matches
    assert(byId(2L) == (Some(102L), Some(2.0)))  // strictly before wins
    assert(byId(3L) == (Some(102L), Some(2.0)))  // later right row ignored
    assert(byId(4L) == (None, None))             // key match, all later
    assert(byId(5L) == (Some(104L), Some(4.0)))
    assert(byId(6L) == (None, None))             // key never present
  }

  test("as-of forward ≡ range-join + argmin, inclusive at equal time") {
    val got = AsOfJoin.forward(leftDf, rightDf, Seq("key"), "lt", "rt",
      Seq("rid", "rv")).select("id", "rid", "rv")

    val matched = leftDf.join(rightDf, Seq("key"))
      .where(col("rt") >= col("lt"))
      .withColumn("__rn", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("rt").asc)))
      .where(col("__rn") === 1)
      .select(col("id"), col("rid"), col("rv"))
    val naiveAll = leftDf.select(col("id")).join(matched, Seq("id"), "left")
      .select("id", "rid", "rv")

    assert(got.orderBy("id").collect().toSeq ==
      naiveAll.orderBy("id").collect().toSeq)
    val byId = got.collect().map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(byId(1L) == (Some(101L), Some(1.0)))  // equal time matches
    assert(byId(2L) == (Some(103L), Some(3.0)))  // earliest at-or-after
    assert(byId(3L) == (Some(103L), Some(3.0)))
    assert(byId(4L) == (Some(104L), Some(4.0)))
    assert(byId(5L) == (None, None))             // key match, all earlier
    assert(byId(6L) == (None, None))             // key never present
  }

  test("as-of NULL times: NULL left → NULL payload; NULL right never matches") {
    val l = Seq((1L, "a", Some(100L)), (2L, "a", None))
      .toDF("id", "key", "t_us")
      .withColumn("lt", timestamp_micros(col("t_us"))).drop("t_us")
    val r = Seq((101L, "a", Some(50L), 1.0), (102L, "a", Some(150L), 2.0),
        (103L, "a", None, 99.0)) // NULL-time right row: must match NOTHING
      .toDF("rid", "key", "t_us", "rv")
      .withColumn("rt", timestamp_micros(col("t_us"))).drop("t_us")
    def byId(df: DataFrame) = df.select("id", "rid").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    val b = byId(AsOfJoin.backward(l, r, Seq("key"), "lt", "rt", Seq("rid", "rv")))
    assert(b == Map(1L -> Some(101L), 2L -> None))
    val f = byId(AsOfJoin.forward(l, r, Seq("key"), "lt", "rt", Seq("rid", "rv")))
    assert(f == Map(1L -> Some(102L), 2L -> None))
  }

  test("as-of NULL keys: SQL equi-join semantics, NULL never matches NULL") {
    val l = Seq((1L, Some("a"), 100L), (2L, None: Option[String], 100L))
      .toDF("id", "key", "t_us")
      .withColumn("lt", timestamp_micros(col("t_us"))).drop("t_us")
    val r = Seq((101L, Some("a"), 50L, 1.0),
        (102L, None: Option[String], 50L, 2.0)) // NULL-key right: matches NOTHING
      .toDF("rid", "key", "t_us", "rv")
      .withColumn("rt", timestamp_micros(col("t_us"))).drop("t_us")
    def byId(df: DataFrame) = df.select("id", "rid").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    // NULL-key left row → null-padded output, NOT paired with the NULL-key
    // right row (Window.partitionBy would group NULLs into one partition)
    val b = byId(AsOfJoin.backward(l, r, Seq("key"), "lt", "rt", Seq("rid", "rv")))
    assert(b == Map(1L -> Some(101L), 2L -> None))
    val f = byId(AsOfJoin.forward(
      l, r.withColumn("rt", timestamp_micros(lit(200L))),
      Seq("key"), "lt", "rt", Seq("rid", "rv")))
    assert(f == Map(1L -> Some(101L), 2L -> None))
  }

  test("range recentPairs ≡ inequality join, boundary semantics") {
    val l = leftDf
    val r = rightDf
    val w = 150L
    val got = RangeJoin.recentPairs(l, r, Seq("key"), "lt", "rt", w)
      .select("id", "rid").orderBy("id", "rid")
    val naive = l.join(r, Seq("key"))
      .where(unix_micros(col("rt")) >= unix_micros(col("lt")) - w &&
             unix_micros(col("rt")) <  unix_micros(col("lt")))
      .select("id", "rid").orderBy("id", "rid")
    assert(got.collect().toSeq == naive.collect().toSeq)
    val pairs = got.collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(pairs.contains((2L, 101L)))  // rt = lt − w: inclusive lower bound
    assert(!pairs.contains((1L, 101L))) // rt = lt: exclusive upper bound
    assert(pairs.contains((3L, 102L)))  // inside the window
  }

  test("stratified sample: deterministic, nested across rates, exact predicate") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "x" else "y"))
      .toDF("id", "s")
    val p1 = Sampling.stratifiedHashSample(df, "id", "s", Map("x" -> 25), 5)
      .collect().map(_.getLong(0)).toSet
    val p2 = Sampling.stratifiedHashSample(df, "id", "s", Map("x" -> 25), 5)
      .collect().map(_.getLong(0)).toSet
    val p3 = Sampling.stratifiedHashSample(df, "id", "s", Map("x" -> 60), 5)
      .collect().map(_.getLong(0)).toSet
    assert(p1 == p2)          // deterministic
    assert(p1.subsetOf(p3))   // raising a rate only adds rows
    val rateX = p1.count(_ % 2 == 0) / 1000.0
    val rateY = p1.count(_ % 2 == 1) / 1000.0
    assert(rateX > 0.15 && rateX < 0.35 && rateY < 0.12)
  }
}
