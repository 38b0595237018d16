package graft

import org.apache.spark.sql.SparkSession

/** Entry smoke + scratch main (the verify skill expects ENTRY_ROWS here).
  * Pass query names as args to print their formatted plans instead.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.isEmpty) {
      val e = SparkEntry.entry(spark)
      println(s"ENTRY_ROWS=${e.count()}")
      e.show(5, false)
    } else {
      val dir = sys.env.getOrElse("DEV_SF", "/root/testdata/sf0.01")
      for (q <- args) {
        println(s"===== $q")
        SparkEntry.queries(q)(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }
}
