package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.TopKAgg

/** TopKAgg (custom TypedImperativeAggregate) must match the
  * `row_number() <= k` window formulation row-for-row — including groups
  * smaller than k, duplicate scores (id tiebreak), and rows arriving in
  * any partition layout (merge path exercised by repartition).
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct(col("score"), col("id")), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("e.score").as("score"), col("e.id").as("id"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("g"), col("rank").cast("int"), col("score"), col("id"))
  }

  test("top-k agg ≡ window row_number over random groups, ties, small groups") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      // scores drawn from a tiny set → many exact ties; group 99 has 2 rows
      val g = if (i % 1000 == 0) 99L else (i % 37).toLong
      (g, (rnd.nextInt(50) / 10.0), i.toLong)
    }
    val df = rows.toDF("g", "score", "id").repartition(13)
    for (k <- Seq(1, 3, 8)) {
      val got = viaAgg(df, k).orderBy("g", "rank").collect().toSeq
      val want = viaWindow(df, k).orderBy("g", "rank").collect().toSeq
      assert(got == want, s"k=$k mismatch")
    }
  }

  test("partial state stays bounded: plan uses partial aggregation, not a window") {
    val df = spark.range(0, 10000)
      .select((col("id") % 5).as("g"), (col("id") % 97).cast("double").as("score"),
        col("id").as("id"))
    val agg = viaAgg(df, 3)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("graft_top_k"), plan.take(400))
    // ObjectHashAggregate runs the typed aggregate with map-side partials
    assert(plan.contains("ObjectHashAggregate"), plan.take(400))
    assert(!plan.contains("Window"), "must not fall back to a window")
    assert(agg.count() == 15)
  }
}
