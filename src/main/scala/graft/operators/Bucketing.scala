package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) tables: the shuffle-amortization layer for keys
  * that are joined or aggregated repeatedly.
  *
  * Writing with `bucketBy(n, key).sortBy(key)` records the hash-partitioned
  * layout in the catalog; any later equi-join or aggregation on the bucket
  * key then satisfies its required distribution straight off the scan — no
  * Exchange in the plan (BucketingSpec asserts exactly that). At 100 TB
  * this converts the per-query shuffle of a fact table into a one-time
  * cost paid at load: upsert targets keyed by `id`/`ticket_id` (K4), the
  * message↔ticket join (J3), and the dedup keeper semi-join all hit the
  * same keys every run.
  *
  * Bucket count rule of thumb at scale: total size / bucket ≈ 128–512 MB,
  * and keep it a multiple of the executor count so every core gets whole
  * buckets. Unlike the snapshot Warehouse (plain parquet dirs), bucketing
  * must go through the session catalog — bucket metadata cannot live in a
  * bare directory.
  */
object Bucketing {

  /** Overwrite `table` with `df` bucketed+sorted by `key` into `buckets`
    * files per write task; `path` makes it an external table.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (path.isEmpty) {
      // a crashed earlier write can leave the managed location behind while
      // the catalog forgot the table; CREATE then refuses the location
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val loc = new java.io.File(warehouse, table)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
