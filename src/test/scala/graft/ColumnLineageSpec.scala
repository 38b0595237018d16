package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ColumnLineage

/** Static column-lineage extraction: outputs map to exactly the source
  * table columns that define them, through projections, joins, and
  * aggregates — no execution.
  */
class ColumnLineageSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("projection + join + aggregate lineage lands on the defining columns") {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val df = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
    val lin = ColumnLineage.of(df)
    assert(lin("revenue").exists(_.endsWith(".o_totalprice")),
      s"revenue lineage: ${lin("revenue")}")
    assert(!lin("revenue").exists(_.endsWith(".c_acctbal")),
      "revenue must not claim unrelated columns")
    assert(lin("c_mktsegment").exists(_.endsWith(".c_mktsegment")))
    // count(1) defines from no source column
    assert(lin("n_orders").isEmpty, s"n_orders: ${lin("n_orders")}")
  }

  test("derived expressions fold all their inputs; filters add none") {
    val o = Tables.load(spark, dir, "orders")
    val df = o.where(col("o_orderstatus") === "F") // control, not data
      .select(concat(col("o_totalprice").cast("string"),
        col("o_orderpriority")).as("w"), col("o_orderkey"))
    val lin = ColumnLineage.of(df)
    assert(lin("w").exists(_.endsWith(".o_totalprice")) &&
      lin("w").exists(_.endsWith(".o_orderpriority")), s"w: ${lin("w")}")
    assert(!lin("w").exists(_.endsWith(".o_orderstatus")),
      "filter predicate columns are control lineage, not data lineage")
    assert(lin("o_orderkey").exists(_.endsWith(".o_orderkey")))
  }

  test("union merges every branch's lineage, not just the first child's") {
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val left = o.select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val right = c.select(col("c_custkey").as("k"), col("c_acctbal").as("v"))
    val lin = ColumnLineage.of(left.unionAll(right))
    assert(lin("k").exists(_.endsWith(".o_orderkey")) &&
      lin("k").exists(_.endsWith(".c_custkey")), s"k: ${lin("k")}")
    assert(lin("v").exists(_.endsWith(".o_totalprice")) &&
      lin("v").exists(_.endsWith(".c_acctbal")), s"v: ${lin("v")}")
  }

  test("multi-hop renames keep tracing to the original leaf") {
    val o = Tables.load(spark, dir, "orders")
    val df = o.select(col("o_totalprice").as("a"))
      .select((col("a") + 1).as("b"))
      .select(col("b").as("c"))
    val lin = ColumnLineage.of(df)
    assert(lin("c").exists(_.endsWith(".o_totalprice")), s"c: ${lin("c")}")
  }
}
