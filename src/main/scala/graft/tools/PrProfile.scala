package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off pagerank cost-floor profile (round 10, VERDICT item 7). */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
      println(f"[prof] $tag: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // warmup
    edges().count()

    for (pass <- 1 to 2) {
      time(s"current impl (3 iters) pass$pass") {
        graft.operators.PageRank.ranks(edges(), "src", "dst", 3)
          .orderBy(col("node")).write.mode("overwrite").format("noop").save()
      }
      // variant A: no per-iteration localCheckpoint
      time(s"variantA no-checkpoint pass$pass") {
        val e = edges().select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        val nodes = e.select(col("src").as("node")).unionByName(e.select(col("dst").as("node"))).distinct()
        val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val nn = nodes.agg(count(lit(1)).as("nn"))
        val S = 1000000000000L
        val base = s"((15 * ($S DIV nn)) DIV 100)"
        val eC = e.cache(); val nodesC = nodes.cache(); val outdegC = outdeg.cache()
        var r = nodesC.crossJoin(broadcast(nn)).select(col("node"), expr(s"$S DIV nn").as("rank"))
        for (_ <- 1 to 3) {
          val contrib = r.join(eC, col("node") === col("src")).join(outdegC, "src")
            .groupBy(col("dst")).agg(sum(expr("rank DIV deg")).as("contrib"))
          r = nodesC.join(contrib, col("node") === col("dst"), "left").crossJoin(broadcast(nn))
            .select(col("node"), expr(s"$base + (85 * coalesce(contrib, 0L)) DIV 100").as("rank"))
        }
        r.orderBy(col("node")).write.mode("overwrite").format("noop").save()
        eC.unpersist(false); nodesC.unpersist(false); outdegC.unpersist(false)
      }
      // variant B: deg folded into edges once; nn as a literal; checkpoint kept
      time(s"variantB fold-deg+lit-nn pass$pass") {
        val e = edges().select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        val nodes = e.select(col("src").as("node")).unionByName(e.select(col("dst").as("node"))).distinct()
        val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val ed = e.join(outdeg, "src").cache()
        val nodesC = nodes.cache()
        val nnV = nodesC.count()
        val S = 1000000000000L
        val base = (15L * (S / nnV)) / 100L
        var r = nodesC.select(col("node"), lit(S / nnV).as("rank"))
        for (_ <- 1 to 3) {
          val contrib = r.join(ed, col("node") === col("src"))
            .groupBy(col("dst")).agg(sum(expr("rank DIV deg")).as("contrib"))
          r = nodesC.join(contrib, col("node") === col("dst"), "left")
            .select(col("node"), expr(s"$base + (85 * coalesce(contrib, 0L)) DIV 100").as("rank"))
            .localCheckpoint()
        }
        r.orderBy(col("node")).write.mode("overwrite").format("noop").save()
        ed.unpersist(false); nodesC.unpersist(false)
      }
      // variant C: share precomputed per-src BEFORE the edge join (shrinks the big join input)
      time(s"variantC share-first pass$pass") {
        val e = edges().select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        val nodes = e.select(col("src").as("node")).unionByName(e.select(col("dst").as("node"))).distinct()
        val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val eC = e.cache(); val nodesC = nodes.cache(); val outdegC = outdeg.cache()
        val nnV = nodesC.count()
        val S = 1000000000000L
        val base = (15L * (S / nnV)) / 100L
        var r = nodesC.select(col("node"), lit(S / nnV).as("rank"))
        for (_ <- 1 to 3) {
          val share = r.join(outdegC, col("node") === col("src"))
            .select(col("src"), expr("rank DIV deg").as("share"))
          val contrib = share.join(eC, "src")
            .groupBy(col("dst")).agg(sum(col("share")).as("contrib"))
          r = nodesC.join(contrib, col("node") === col("dst"), "left")
            .select(col("node"), expr(s"$base + (85 * coalesce(contrib, 0L)) DIV 100").as("rank"))
            .localCheckpoint()
        }
        r.orderBy(col("node")).write.mode("overwrite").format("noop").save()
        eC.unpersist(false); nodesC.unpersist(false); outdegC.unpersist(false)
      }
    }
    spark.stop()
  }
}
