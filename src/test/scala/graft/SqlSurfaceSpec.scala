package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL front-end surfaces that have no DuckDB counterpart to oracle
  * against: parameterized queries (named and positional binding — the
  * injection-safe form of the reference's f-string SQL built for
  * BigQuery, SURVEY §3 IR note).
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("named-parameter SQL binds literals without string interpolation") {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("param_orders_v")
    val lit = spark.sql(
      "SELECT count(*) AS n FROM param_orders_v WHERE o_totalprice > 200000.0 AND o_orderstatus = 'O'")
      .head().getLong(0)
    val named = spark.sql(
      "SELECT count(*) AS n FROM param_orders_v WHERE o_totalprice > :minp AND o_orderstatus = :st",
      Map("minp" -> 200000.0, "st" -> "O")).head().getLong(0)
    val positional = spark.sql(
      "SELECT count(*) AS n FROM param_orders_v WHERE o_totalprice > ? AND o_orderstatus = ?",
      Array(200000.0, "O")).head().getLong(0)
    assert(named == lit && positional == lit && lit > 0)
  }

  test("a malicious parameter value stays a literal, not SQL") {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("param_orders_v")
    // bound as a VALUE: matches no status rather than changing the query
    val n = spark.sql(
      "SELECT count(*) AS n FROM param_orders_v WHERE o_orderstatus = :st",
      Map("st" -> "' OR '1'='1")).head().getLong(0)
    assert(n == 0L)
  }
}
