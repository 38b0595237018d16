package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pagerank decomposition: fixed graph-build cost vs marginal per-iteration cost. */
object PrProfile2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def edges() = {
      val li = graft.Tables.load(spark, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
      val ord = graft.Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("sn")).distinct()
      pairs.select(col("c").as("src"), col("sn").as("dst"))
        .unionByName(pairs.select(col("sn").as("src"), col("c").as("dst")))
    }
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof2] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    edges().count() // warmup
    for (pass <- 1 to 2) {
      time(s"graph-build-only (count) pass$pass") { edges().write.mode("overwrite").format("noop").save() }
      for (it <- Seq(1, 3, 6)) {
        time(s"ranks iters=$it pass$pass") {
          graft.operators.PageRank.ranks(edges(), "src", "dst", it)
            .orderBy(col("node")).write.mode("overwrite").format("noop").save()
        }
      }
    }
    spark.stop()
  }
}
