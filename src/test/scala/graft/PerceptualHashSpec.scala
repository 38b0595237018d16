package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Perceptual-hash (aHash) image dedup: hash semantics on known feature
  * grids, brightness invariance, and the banded near-dup join.
  */
class PerceptualHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def hashOf(features: Seq[Float]): Long =
    Seq(Tuple1(features)).toDF("f")
      .select(Multimodal.perceptualHash(col("f")).as("h"))
      .as[Long].first()

  test("perceptualHash: bit i set exactly when cell i exceeds the mean") {
    // cells 0..15 = 0..15; mean 7.5 → bits 8..15 set
    val h = hashOf((0 until 16).map(_.toFloat))
    assert(h == 0xFF00L)
    // all-equal grid: nothing exceeds the mean → hash 0
    assert(hashOf(Seq.fill(16)(3.0f)) == 0L)
  }

  test("perceptualHash: invariant under brightness scaling") {
    val base = (0 until 16).map(i => (i * 10 + 5).toFloat)
    val brighter = base.map(_ * 1.7f)
    assert(hashOf(base) == hashOf(brighter))
  }

  /** 8×8 PNG, one pixel per cell of the dedup path's 8×8 (64-bit) hash
    * grid — the given 64 luminances ARE the grid cells.
    */
  private def gridPng(cells: Seq[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = cells(y * 8 + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dedupByPerceptualHash: near-identical image marked, distinct kept") {
    val a = (0 until 64).map(i => i * 4)            // gradient, mean ≈ 126
    val a2 = a.updated(63, 250)                     // same side of mean everywhere
    val c = a.reverse                               // mirrored → different hash
    val rows = Seq((1L, gridPng(a)), (2L, gridPng(a2)), (3L, gridPng(c)))
      .toDF("media_id", "payload")
    val got = Multimodal.dedupByPerceptualHash(rows, maxHamming = 1)
      .orderBy("media_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => r._1 -> r._3) == Seq(1L -> false, 2L -> true, 3L -> false))
    // the two near-dups really share a hash; the mirror really differs
    assert(got(0)._2 == got(1)._2 && got(0)._2 != got(2)._2)
  }

  test("dedupByPerceptualHash: hash is 64-bit — wide gradients fill high bits") {
    // a 16-bit hash could never set bit 63; the gradient's top-half cells
    // all exceed the mean, so bits 32..63 are set → a genuinely wide hash
    val h = Multimodal.dedupByPerceptualHash(
      Seq((1L, gridPng((0 until 64).map(_ * 4)))).toDF("media_id", "payload"))
      .as[(Long, Long, Boolean)].first()._2
    assert((h >>> 32) != 0L, f"high bits empty: $h%016x")
    assert(h == ((-1L >>> 32) << 32), f"expected top-half bits set, got $h%016x")
  }

  test("dedupByPerceptualHash: undecodable payloads drop out, never match") {
    val rows = Seq((1L, gridPng((0 until 64).map(_ * 4))),
      (2L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val got = Multimodal.dedupByPerceptualHash(rows)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq(1L) && !got.head._3)
  }
}
