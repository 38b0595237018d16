package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GlobalRank

/** The sharded global-rank helpers must replicate Spark's own
  * partition-less window semantics EXACTLY (they replace it in queries
  * whose input is corpus-cardinality), across remainder shapes and
  * tiny-input edge cases.
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // non-monotonic values with a unique tiebreaker, sized to NOT divide
  // evenly by 4 (exercises ntile's big-buckets-first fill rule)
  private def sample(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 37 % 101).toLong)).toDF("id", "v")

  test("globalRowNumber == partition-less row_number across range partitions") {
    val df = sample(1003)
    val keys = Seq(col("v").desc, col("id"))
    val got = GlobalRank.globalRowNumber(df, keys, "rn")
      .select($"id", $"rn").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rn", row_number().over(Window.orderBy(keys: _*)))
      .select($"id", $"rn".cast("long")).as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("shardedNtile == native ntile for uneven, even, and fewer-rows-than-buckets inputs") {
    for (n <- Seq(1, 3, 4, 17, 1000, 1003)) {
      val df = sample(n)
      val keys = Seq(col("v"), col("id"))
      val got = GlobalRank.shardedNtile(df, 4, keys, "t")
        .select($"id", $"t").as[(Long, Int)].collect().toMap
      val want = df.withColumn("t", ntile(4).over(Window.orderBy(keys: _*)))
        .select($"id", $"t").as[(Long, Int)].collect().toMap
      assert(got == want, s"n=$n")
    }
  }

  test("the sharded plan ranks through a __pid-partitioned window, never a single partition") {
    val df = sample(500)
    // globalRowNumber's window + offsets join sit DOWNSTREAM of its
    // checkpoint, so they are visible in this plan (shardedNtile's final
    // projection hides them behind a second checkpoint)
    val out = GlobalRank.globalRowNumber(df, Seq(col("v"), col("id")), "rn")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"),
      s"expected the per-partition rank window:\n${plan.take(800)}")
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange:\n${plan.take(600)}")
  }
}
