package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomPrune

class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val fact = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "a"), (5L, "zz"),
    (6L, null.asInstanceOf[String]), (7L, "q"), (8L, "b")
  ).toDF("id", "k")

  private lazy val dim = Seq("a", "b", "x").toDF("dk")

  test("no false negatives: every dim key passes mightContain") {
    val bloom = BloomPrune.buildBloom(dim, "dk", expectedItems = 16, fpp = 0.01)
    val hits = dim.where(BloomPrune.mightContain(bloom, col("dk"))).count()
    assert(hits == 3)
  }

  test("semiJoin ≡ plain left_semi (false positives closed by exact join)") {
    val got = BloomPrune.semiJoin(fact, dim, "k", "dk", expectedItems = 16)
      .select("id").as[Long].collect().sorted.toSeq
    val want = fact.join(dim, fact("k") === dim("dk"), "left_semi")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want && want == Seq(1L, 2L, 4L, 8L))
  }

  test("antiJoin ≡ plain left_anti, null keys kept") {
    val got = BloomPrune.antiJoin(fact, dim, "k", "dk", expectedItems = 16)
      .select("id").as[Long].collect().sorted.toSeq
    val want = fact.join(dim, fact("k") === dim("dk"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == want && want == Seq(3L, 5L, 6L, 7L))
  }

  test("semiJoin ≡ left_semi under an adversarial fpp=0.5 tiny filter") {
    // deliberately undersized filter → many false positives; the exact
    // join must still close them all
    val bigFact = (1L to 500L).map(i => (i, s"k$i")).toDF("id", "k")
    val smallDim = Seq("k3", "k250", "k499").toDF("dk")
    val got = BloomPrune.semiJoin(bigFact, smallDim, "k", "dk",
      expectedItems = 2, fpp = 0.5).select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L, 250L, 499L))
  }

  test("empty dim: semi prunes everything, anti keeps everything") {
    val emptyDim = dim.where(lit(false))
    assert(BloomPrune.semiJoin(fact, emptyDim, "k", "dk",
      expectedItems = 16).count() == 0)
    assert(BloomPrune.antiJoin(fact, emptyDim, "k", "dk",
      expectedItems = 16).count() == fact.count())
  }

  test("prefilter plan carries the codegen might_contain predicate") {
    // range-backed fact: LocalRelation would be eagerly folded away
    val bigFact = spark.range(100).select(col("id"),
      concat(lit("k"), col("id")).as("k"))
    val pruned = BloomPrune.prefilter(bigFact, dim, "k", "dk", expectedItems = 16)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
  }
}
