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

  test("resize: exact target geometry, deterministic, null-safe") {
    val t1 = Multimodal.resizeAll(media, 8, 4).orderBy("media_id").collect()
    val t2 = Multimodal.resizeAll(media, 8, 4).orderBy("media_id").collect()
    assert(t1.forall(r => r.getAs[Array[Byte]]("thumb").length == 32))
    assert(t1.map(_.getAs[Array[Byte]]("thumb").toSeq).toSeq ==
      t2.map(_.getAs[Array[Byte]]("thumb").toSeq).toSeq)
    val nullRow = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, null, Row("img", 0, 0, 0L)))),
      Multimodal.MediaSchema)
    assert(Multimodal.resizeAll(nullRow, 4, 4).collect()
      .head.getAs[Array[Byte]]("thumb").length == 16)
  }

  test("frame sampling: one row per everyMs step, frame 0 kept, features differ by frame") {
    val videos = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 10L).map { i =>
        Row(i, Array.fill((i * 100).toInt)((i % 127).toByte),
          Row("vid", 64, 64, i * 1000))
      }), Multimodal.MediaSchema)
    val frames = Multimodal.sampleFrames(videos, everyMs = 2000)
      .orderBy("media_id", "frame_ms").collect()
    val byId = frames.groupBy(_.getLong(0))
    byId.foreach { case (id, rows) =>
      val durMs = id * 1000
      val expected = (0L until math.max(durMs, 1L) by 2000L).toSeq
      assert(rows.map(_.getLong(1)).toSeq == expected, s"media $id")
    }
    // distinct frames of one video decode to distinct feature vectors
    val v10 = byId(10L).map(_.getSeq[Float](2))
    assert(v10.distinct.length == v10.length)
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
