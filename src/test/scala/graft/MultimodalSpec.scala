package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def media = {
    val rows = (1L to 10L).map { i =>
      Row(i, Array.fill((i * 100).toInt)((i % 127).toByte),
        Row("img", 64, 64, 0L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
  }

  test("feature extraction: schema, determinism, byte accounting") {
    val f1 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(f1.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
    assert(f1.forall(_.getSeq[Float](1).size == Multimodal.FeatureDim))
    assert(f1.map(_.getLong(2)).toSeq == (1L to 10L).map(_ * 100))
  }

  test("null payload → zero features, zero bytes") {
    val rows = Seq(Row(1L, null, Row("img", 0, 0, 0L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val got = Multimodal.extractFeatures(df).collect().head
    assert(got.getSeq[Float](1).forall(_ == 0f) && got.getLong(2) == 0L)
  }

  test("byte-budget repartitioning: no partition exceeds ~budget") {
    val parts = Multimodal.repartitionByBytes(media, targetBytes = 1500)
    import org.apache.spark.sql.functions._
    val sizes = parts
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(sum(length(col("payload"))).as("bytes"))
      .collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 3000)) // budget + one max row of slack
    assert(parts.count() == 10)
  }
}
