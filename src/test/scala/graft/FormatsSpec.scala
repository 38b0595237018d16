package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** §2.1 source/sink breadth beyond parquet: the same frame round-trips
  * through ORC (columnar alternative), CSV (header + explicit schema —
  * inference would re-scan at 100 TB), and JSON lines. Parquet stays the
  * canonical warehouse format; these cover ingest/egress edges.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def sample = spark.range(0, 100)
    .select(col("id"),
      concat(lit("n"), col("id")).as("name"),
      (col("id") * 1.5).as("score"))

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_fmt_$fmt").toString
    sample.write.mode("overwrite").format(fmt)
      .options(if (fmt == "csv") Map("header" -> "true") else Map.empty[String, String])
      .save(dir)
    val back = spark.read.format(fmt)
      .options(if (fmt == "csv") Map("header" -> "true") else Map.empty[String, String])
      .schema(schema).load(dir)
    val got = back.orderBy("id").as[(Long, String, Double)].collect().toSeq
    val want = sample.orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(got == want, s"$fmt round-trip mismatch")
  }

  test("ORC round-trip preserves rows and types") { roundTrip("orc") }
  test("CSV round-trip with explicit schema (no inference scan)") { roundTrip("csv") }
  test("JSON-lines round-trip with explicit schema") { roundTrip("json") }

  test("CSV malformed rows: PERMISSIVE null-fills, DROPMALFORMED drops") {
    val dir = Files.createTempDirectory("graft_fmt_bad").toString
    Files.write(java.nio.file.Paths.get(dir, "part.csv"),
      "id,name,score\n1,a,1.5\nnot_a_long,b,2.5\n3,c,3.5\n".getBytes)
    val permissive = spark.read.option("header", "true").schema(schema)
      .option("mode", "PERMISSIVE").csv(dir)
    assert(permissive.count() == 3)
    assert(permissive.where(col("id").isNull).count() == 1)
    val dropped = spark.read.option("header", "true").schema(schema)
      .option("mode", "DROPMALFORMED").csv(dir)
    // count() alone never parses cell values (CSV column pruning), so
    // malformed rows go undetected — materialize real columns to count
    assert(dropped.select("id", "name", "score").collect().length == 2)
  }

  test("corrupt parquet file: fail-fast by default, skip with ignoreCorruptFiles") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt").toString
    (1 to 10).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // drop a non-parquet file into the dataset directory
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt.parquet"),
      Array[Byte](1, 2, 3, 4, 5))
    // default: the corrupt member fails the read loudly (no silent loss)
    val failed = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    assert(failed.getMessage != null)
    // opt-in resilience: the 100 TB-crawl posture — skip and keep going
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try assert(spark.read.parquet(dir).count() == 10)
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", p)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("_metadata hidden columns: per-row file provenance without a stored column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-meta").toString
    (1 to 6).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      .repartition(3).write.mode("overwrite").parquet(dir)
    val withProv = spark.read.parquet(dir)
      .select($"id", col("_metadata.file_path").as("src_file"),
        col("_metadata.file_size").as("src_bytes"))
    val rows = withProv.collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getString(1).endsWith(".parquet")))
    assert(rows.map(_.getString(1)).distinct.length == 3,
      "expected three distinct source files")
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("compression codec matrix: zstd/snappy/gzip/lz4 parquet round-trips agree") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"text-$i", i * 1.5)).toDF("id", "t", "x")
    val expected = df.orderBy("id").collect().toSeq
    Seq("zstd", "snappy", "gzip", "lz4").foreach { codec =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-$codec").toString
      df.write.mode("overwrite").option("compression", codec).parquet(dir)
      val back = spark.read.parquet(dir).orderBy("id").collect().toSeq
      assert(back == expected, s"codec $codec round-trip diverged")
    }
  }
}
