package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.TrainingWave2Queries

/** Round-6 training wave 2: the BPE merge fold (the one piece of
  * bpe_merge_train the oracle cannot decompose — boundary safety and
  * greedy left-to-right semantics), the EWMA fold, and the degree-
  * oriented triangle count against the naive formulation.
  */
class TrainingWave2Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def merge(sym: String, p1: String, p2: String): String =
    Seq(sym).toDF("sym")
      .select(TrainingWave2Queries.applyMerge(col("sym"), p1, p2))
      .as[String].first()

  test("applyMerge: consecutive overlapping occurrences all merge") {
    assert(merge("a b a b", "a", "b") == "ab ab")
    assert(merge("x a b a b", "a", "b") == "x ab ab")
  }

  test("applyMerge: pair matches only at symbol boundaries") {
    // symbols [ab, c]: pair (b, c) must NOT merge inside symbol 'ab'
    assert(merge("ab c", "b", "c") == "ab c")
    // but symbols [a, b, c] with pair (b, c) does merge
    assert(merge("a b c", "b", "c") == "a bc")
  }

  test("applyMerge: no cascading within a round (greedy left-to-right)") {
    // classic BPE: 'a a a' with pair (a,a) → [aa, a], never [aaa]
    assert(merge("a a a", "a", "a") == "aa a")
    assert(merge("a a a a", "a", "a") == "aa aa")
  }

  test("applyMerge: start, end, and single-symbol words") {
    assert(merge("a b x", "a", "b") == "ab x")
    assert(merge("x a b", "a", "b") == "x ab")
    assert(merge("q", "a", "b") == "q")
  }

  test("applyMerge: multi-char symbols merge as whole units") {
    // round-2 shape: symbols [th, e] merging into [the]
    assert(merge("x th e y", "th", "e") == "x the y")
    // suffix collision: [t, he] with pair (h, e) — 'he' is one symbol,
    // no 'h' symbol present, nothing merges
    assert(merge("t he", "h", "e") == "t he")
  }

  test("ewmaFold: alpha=0.5 halving fold, empty → null") {
    val got = Seq(
      (1, Seq(1.0, 2.0, 3.0)), (2, Seq(10.0)), (3, Seq.empty[Double]))
      .toDF("id", "vals")
      .select(col("id"), TrainingWave2Queries.ewmaFold(col("vals"), 0.5).as("e"))
      .orderBy("id").as[(Int, Option[Double])].collect().toSeq
    // (1 → 1.0), (+2 → 1.5), (+3 → 2.25)
    assert(got == Seq((1, Some(2.25)), (2, Some(10.0)), (3, None)))
  }

  test("triangleCoeff: degree-oriented count equals the naive count") {
    // K4 on {1,2,3,4} plus a pendant 5—1: 4 triangles; degrees
    // (4,3,3,3,1) → wedges 6+3+3+3+0 = 15; cc = 12/15
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5))
      .map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }
    val e = edges.toDF("u", "v")
    val got = TrainingWave2Queries.triangleCoeff(e)
      .as[(Long, Long, Double)].first()
    assert(got == ((4L, 15L, 3.0 * 4 / 15)))
    val naive = e.as("e1")
      .join(e.as("e2"), col("e2.u") === col("e1.v"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") &&
        col("e3.v") === col("e2.v"))
      .count()
    assert(naive == got._1)
  }

  test("triangleCoeff: triangle-free graph has cc 0 without dividing") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v") // a path: 1 wedge, 0 tri
    val got = TrainingWave2Queries.triangleCoeff(e)
      .as[(Long, Long, Double)].first()
    assert(got == ((0L, 1L, 0.0)))
  }
}
