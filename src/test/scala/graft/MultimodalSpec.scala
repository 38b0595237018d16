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

  /** A real PNG: w×h horizontal gray gradient (left dark → right light). */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = x * 255 / math.max(1, w - 1)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: true geometry, gradient shows in grid features") {
    val rows = Seq(
      Row(1L, pngBytes(16, 8), Row("img", 16, 8, 0L)),
      Row(2L, "not an image".getBytes, Row("img", 0, 0, 0L)),
      Row(3L, null, Row("img", 0, 0, 0L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val got = Multimodal.extractImageFeatures(df).orderBy("media_id").collect()
    val ok = got(0)
    assert(ok.getAs[Boolean]("decoded") && ok.getAs[Int]("width") == 16 &&
      ok.getAs[Int]("height") == 8)
    val f = ok.getSeq[Float](ok.fieldIndex("features"))
    assert(f.size == Multimodal.FeatureDim)
    // row-major 4×4 grid over a left-to-right gradient: strictly brighter
    // across each grid row, equal down each column
    assert(f(0) < f(1) && f(1) < f(2) && f(2) < f(3))
    assert(f.grouped(4).toSeq.distinct.size == 1)
    // corrupt + null payloads degrade to the stub with decoded=false
    assert(!got(1).getAs[Boolean]("decoded") && !got(2).getAs[Boolean]("decoded"))
    assert(got(1).getSeq[Float](got(1).fieldIndex("features")).size == Multimodal.FeatureDim)
  }

  test("real audio decode: WAV duration + loud/quiet halves in features") {
    // 500 ms mono 16-bit 8 kHz WAV: silent first half, full-scale square
    // wave second half — written through the same JDK codec that decodes
    def wavBytes(ms: Int, rate: Float = 8000f): Array[Byte] = {
      val n = (rate * ms / 1000).toInt
      val pcm = new Array[Byte](n * 2)
      var i = n / 2 // loud second half only
      while (i < n) {
        val v: Short = if (i % 8 < 4) 30000 else -30000
        pcm(2 * i) = (v & 0xFF).toByte; pcm(2 * i + 1) = (v >> 8).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      Row(1L, wavBytes(500), Row("wav", 0, 0, 0L)),
      Row(2L, "not audio at all".getBytes, Row("wav", 0, 0, 0L)),
      Row(3L, null, Row("wav", 0, 0, 0L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val got = Multimodal.extractAudioFeatures(df).orderBy("media_id").collect()
    val ok = got(0)
    assert(ok.getAs[Boolean]("decoded"))
    assert(ok.getAs[Long]("duration_ms") == 500L)
    val f = ok.getSeq[Float](ok.fieldIndex("features"))
    assert(f.size == Multimodal.FeatureDim)
    val (quiet, loud) = f.splitAt(Multimodal.FeatureDim / 2)
    assert(quiet.forall(_ < 0.01f), s"first half should be silent: $quiet")
    assert(loud.forall(_ > 0.8f), s"second half should be near full scale: $loud")
    // corrupt + null payloads degrade to the stub with decoded=false
    assert(!got(1).getAs[Boolean]("decoded") && !got(2).getAs[Boolean]("decoded"))
    assert(got(1).getSeq[Float](got(1).fieldIndex("features")).size ==
      Multimodal.FeatureDim)
  }

  test("real image resize: thumb is a valid PNG with target geometry") {
    val rows = Seq(
      Row(1L, pngBytes(32, 16), Row("img", 32, 16, 0L)),
      Row(2L, "junk".getBytes, Row("img", 0, 0, 0L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
    val got = Multimodal.resizeImages(df, 8, 4).orderBy("media_id").collect()
    val thumb = got(0).getAs[Array[Byte]]("thumb")
    assert(got(0).getAs[Boolean]("decoded"))
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(thumb))
    assert(back.getWidth == 8 && back.getHeight == 4)
    // gradient survives the scale: left edge darker than right edge
    assert((back.getRGB(0, 0) & 0xFF) < (back.getRGB(7, 0) & 0xFF))
    // junk payload falls back to the stub thumbnail, flagged
    assert(!got(1).getAs[Boolean]("decoded"))
    assert(got(1).getAs[Array[Byte]]("thumb").length == 32)
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
