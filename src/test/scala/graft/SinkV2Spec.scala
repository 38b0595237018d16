package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 staged-commit sink (GraftParquetSinkProvider): append and
  * truncate-overwrite land exactly the committed task files; a failed job
  * leaves the table untouched (no partial output); the task parquet reads
  * back with full type fidelity.
  */
class SinkV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val FMT = "graft.sources.v2.GraftParquetSinkProvider"

  private def sample(n: Int) = spark.range(0, n)
    .select(col("id"), concat(lit("u"), col("id")).as("name"),
      (col("id") * 1.5).as("score"),
      (col("id") % 2 === 0).as("flag"),
      timestamp_micros(col("id") * 1000000L).as("ts"))

  test("append writes committed task files; read-back is type-faithful") {
    val dir = Files.createTempDirectory("graft_sink_v2").toString
    sample(1000).repartition(4)
      .write.format(FMT).option("path", dir).mode(SaveMode.Append).save()
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      sample(1).schema.map(f => (f.name, f.dataType)))
    val row = back.where(col("id") === 42).collect().head
    assert(row.getAs[String]("name") == "u42" &&
      row.getAs[Double]("score") == 63.0 && row.getAs[Boolean]("flag") &&
      row.getAs[java.sql.Timestamp]("ts") ==
        java.sql.Timestamp.valueOf("1970-01-01 00:00:42"))
    // second append accumulates
    sample(500).write.format(FMT).option("path", dir).mode(SaveMode.Append).save()
    assert(spark.read.parquet(dir).count() == 1500)
    // no staging leftovers
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_staging_")))
  }

  test("overwrite truncates atomically at commit") {
    val dir = Files.createTempDirectory("graft_sink_v2_ow").toString
    sample(800).write.format(FMT).option("path", dir).mode(SaveMode.Append).save()
    sample(300).write.format(FMT).option("path", dir).mode(SaveMode.Overwrite).save()
    assert(spark.read.parquet(dir).count() == 300)
  }

  test("failed job aborts: table keeps its previous contents") {
    val dir = Files.createTempDirectory("graft_sink_v2_abort").toString
    sample(100).write.format(FMT).option("path", dir).mode(SaveMode.Append).save()
    val boom = sample(100).select(col("id"), col("name"), col("score"),
      col("flag"), col("ts"),
      (lit(100L) / (col("id") - 50)).cast("long").as("poison"))
    intercept[Exception] {
      boom.write.format(FMT).option("path", dir).mode(SaveMode.Overwrite).save()
    }
    val back = spark.read.parquet(dir)
    assert(back.count() == 100, "abort must leave prior table intact")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_staging_")),
      "staging must be cleaned up on abort")
  }
}
