package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * At cluster scale these would be catalog tables (Parquet/Iceberg) — the
  * loader keeps the read declarative (`spark.read.parquet`) so Catalyst
  * pushes filters and prunes columns into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = if (name == "events") loadEvents(spark, dir)
             else spark.read.parquet(s"$dir/$name.parquet")
    spread(spark, df)
  }

  /** The test tables are single-row-group parquet files, which Spark
    * cannot split — every scan would run as ONE task regardless of cores,
    * serializing all per-row expression work. One round-robin repartition
    * restores cluster parallelism; at production scale tables arrive as
    * many files/row groups and this becomes a no-op decision at write
    * time, not read time.
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** The events table carries a parquet TIMESTAMP(NANOS) column, which
    * Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos
    * as long (legacy flag) and convert to a microsecond timestamp with
    * integer division (`div`), matching DuckDB's TIMESTAMP_NS → TIMESTAMP
    * truncation exactly.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
