package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** The two scan-pruning mechanisms a 100 TB layout depends on:
  * static partition pruning (a literal predicate on the partition column
  * reaches the scan as a partition filter — only matching directories are
  * listed) and dynamic partition pruning (a selective dim-side filter
  * prunes fact partitions at runtime through the join).
  */
class PruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val factDir = {
    val dir = Files.createTempDirectory("graft_fact").toString
    spark.range(0, 10000)
      .select(col("id"), (col("id") % 10).as("part_key"),
        (col("id") % 97).as("v"))
      .write.mode("overwrite").partitionBy("part_key").parquet(dir)
    dir
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collectFirst { case s: FileSourceScanExec => s }.get
  }

  test("static partition pruning: literal predicate lists one directory") {
    val q = spark.read.parquet(factDir).where(col("part_key") === 3)
    val scan = scanOf(q)
    assert(scan.partitionFilters.nonEmpty, "partition filter missing from scan")
    assert(scan.inputRDDs().head.getNumPartitions <= 4)
    assert(q.count() == 1000)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions through the join") {
    // NOTE: a Seq.toDF dim won't do — ConvertToLocalRelation folds the tag
    // filter into the LocalRelation, leaving no selective predicate for
    // the DPP rule to see. A computed column over range() keeps the Filter
    // node (and id % 3 defeats literal equality propagation, so pruning is
    // genuinely dynamic, not static).
    val dim = spark.range(0, 10)
      .select(col("id").as("dim_key"),
        when(col("id") % 3 === 1, "pick").otherwise("skip").as("tag"))
    val q = spark.read.parquet(factDir)
      .join(dim, col("part_key") === col("dim_key"))
      .where(col("tag") === "pick")
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"no DPP subquery in plan:\n${planStr.take(800)}")
    assert(q.count() == 3000) // part_key ∈ {1, 4, 7}
  }
}
