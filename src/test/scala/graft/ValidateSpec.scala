package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Validate

/** Contract-validation semantics: value rules ignore nulls (additive
  * report), uniqueness counts rows beyond the first per key, referential
  * counts only non-null orphans.
  */
class ValidateSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val df = Seq(
    (Some(1), Some("O"), Some(10.0), Some("1-URGENT")),
    (None, Some("X"), Some(-5.0), Some("9-BOGUS")),
    (Some(2), None, None, None),
    (Some(2), Some("F"), Some(99.0), Some("5-LOW")))
    .toDF("k", "status", "price", "prio")

  test("check: one pass, nulls fail only not_null") {
    val got = Validate.check(df, Seq(
        Validate.notNull("k"),
        Validate.inSet("status", Seq("O", "F", "P")),
        Validate.inRange("price", 0, 100),
        Validate.matches("prio", "^[1-5]-")))
      .as[(String, Long, Long)].collect().toSeq
      .map { case (r, v, _) => r -> v }.toMap
    assert(got == Map(
      "not_null(k)" -> 1L,       // the None key; nothing else
      "in_set(status)" -> 1L,    // 'X'; the null row is NOT a violation
      "in_range(price)" -> 1L,   // -5.0; null ignored
      "matches(prio)" -> 1L))    // 9-BOGUS; null ignored
  }

  test("checkUnique: rows beyond the first per key") {
    val got = Validate.checkUnique(df, Seq("k"))
      .as[(String, Long, Long)].first()
    // keys {1, null, 2, 2} → 3 distinct (null groups as a key) → 1 extra
    assert(got == (("unique(k)", 1L, 4L)))
  }

  test("checkReferential: non-null orphans only") {
    val dim = Seq(1).toDF("id")
    val got = Validate.checkReferential(df, "k", dim, "id")
      .as[(String, Long, Long)].first()
    // k ∈ {1, null, 2, 2}: null skipped, the two 2s are orphans
    assert(got == (("referential(k->id)", 2L, 4L)))
  }
}
