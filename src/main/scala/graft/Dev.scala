package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for schema/plan inspection during development. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.functions._
    import graft.operators._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val df = Tables.load(spark, dir, "documents")
    println("docs=" + df.count())

    val sh = df.select(col("doc_id").as("id"),
        SimFns.wordShingles(TextAnalysisFns.tokens(col("text")), 3).as("shingles"))
      .where(size(col("shingles")) > 0)
    time("shingles")(sh.write.format("noop").mode("overwrite").save())

    val sig = sh.select(col("id"), explode(col("shingles")).as("s"))
      .groupBy(col("id"))
      .agg(min(md5(concat(lit("0:"), col("s")))).as("h0"),
        (1 until 8).map(j => min(md5(concat(lit(s"$j:"), col("s")))).as(s"h$j")): _*)
    time("signatures")(sig.write.format("noop").mode("overwrite").save())

    val bandCols = (0 until 4).map { i =>
      val sl = (i * 2 until (i + 1) * 2).map(j => col(s"h$j"))
      concat(lit(s"$i#"), md5(concat_ws(",", sl: _*)))
    }
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).as("band"))
    val pairs = banded.alias("a")
      .join(banded.alias("b"), col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    println("pairs=" + time("pairs")(pairs.count()))

    val full = Dedup.minhashLsh(df, "doc_id", "text", 3, 8, 4, 0.2)
    time("full")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
