package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Z-order layout: rows unchanged, and per-partition bounding boxes become
  * tight enough that a small 2-D query rectangle overlaps few partitions —
  * the property parquet min/max file skipping turns into pruned I/O.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // 64k points on a 256×256 grid, in insertion order that correlates with
  // neither dimension pair (worst case for naive layout)
  private def points = spark.range(0, 65536).select(
    (col("id") * 2654435761L % 256).as("x"),
    (col("id") * 40503L % 256).as("y"),
    col("id").as("payload"))

  private def overlapCount(df: org.apache.spark.sql.DataFrame,
                           qx: (Long, Long), qy: (Long, Long)): Long =
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .where(col("x0") <= qx._2 && col("x1") >= qx._1 &&
        col("y0") <= qy._2 && col("y1") >= qy._1)
      .count()

  test("z-order: same rows, small rectangle hits few partitions") {
    val z = Layout.zOrder(points, Seq("x", "y"), numFiles = 64).cache()
    assert(z.columns.toSeq == Seq("x", "y", "payload"))
    assert(z.count() == 65536)
    assert(z.agg(sum("payload")).first().getLong(0) ==
      points.agg(sum("payload")).first().getLong(0))

    // a 16×16 query rectangle = 1/256 of the space
    val zHits = overlapCount(z, (32, 47), (96, 111))
    val naiveHits = overlapCount(points.repartition(64), (32, 47), (96, 111))
    // naive hash layout: every partition spans the space → ~64 hits;
    // z-order: the rectangle lives in a handful of curve segments
    assert(naiveHits >= 48, s"naive layout unexpectedly tight: $naiveHits")
    assert(zHits <= 8, s"z-order layout not tight: $zHits partitions overlap")
    z.unpersist()
  }

  test("z-order: constant dimension degrades gracefully (span 0)") {
    val flat = spark.range(0, 1000).select(lit(7L).as("x"), col("id").as("y"),
      col("id").as("payload"))
    val z = Layout.zOrder(flat, Seq("x", "y"), numFiles = 4)
    assert(z.count() == 1000)
  }

  test("interleave: known bit patterns") {
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L)).toDF("a", "b")
    val got = df.select(Layout.interleave(Seq(col("a"), col("b"))).as("z"))
      .as[Long].collect().toSeq
    // a occupies even bits, b odd bits
    assert(got == Seq(5L, 10L, 3L))
  }
}
