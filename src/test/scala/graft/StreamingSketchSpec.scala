package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SketchFns
import graft.streaming.Streams
import graft.streaming.Streams.Event

/** Streaming HLL registers in MapState: estimates carried across batches
  * must equal the batch column pipeline over the same rows EXACTLY —
  * the mergeable-sketch law in its streaming form.
  */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hllDistinctUsers: streaming registers ≡ batch sketch, state survives batches") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val out = Streams.hllDistinctUsers(mem.toDS())
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("hll_stream").start()
    try {
      val batch1 = (1 to 40).map(i =>
        Event(i, ts("2024-01-01 10:00:00"), i % 25, "click", 1.0))
      val batch2 = (41 to 80).map(i =>
        Event(i, ts("2024-01-01 11:00:00"), i % 60, "click", 1.0))
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // last emitted estimate for the key reflects BOTH batches' users
      val streamed = spark.table("hll_stream")
        .as[Streams.TypeEstimate].collect()
      val last = streamed.last
      // batch recompute over the union of rows via the column pipeline
      val allRows = (batch1 ++ batch2).toDS()
      val h = SketchFns.hash60(col("user_id"))
      val batchEst = allRows
        .select(SketchFns.hllBucket(h).as("bucket"),
          SketchFns.hllRho(SketchFns.hllRem(h)).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("maxrho"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - maxrho)")).as("sp"),
          count(lit(1)).as("nb"))
        .select(SketchFns.hllEstimate(col("sp"), col("nb")).as("est"),
          col("nb"))
        .as[(Double, Long)].first()
      assert(last.estimate == batchEst._1,
        s"streaming ${last.estimate} != batch ${batchEst._1}")
      assert(last.n_buckets == batchEst._2)
      // and the batch-1-only emission used fewer registers (state grew)
      assert(streamed.head.n_buckets < last.n_buckets)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("topKUsersByValue: ranks evolve across batches, exact cent totals") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val out = Streams.topKUsersByValue(mem.toDS(), k = 2)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("topk_stream").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.50),
        Event(2, ts("2024-01-01 10:01:00"), 2, "click", 2.25),
        Event(3, ts("2024-01-01 10:02:00"), 3, "click", 0.75))
      q.processAllAvailable()
      // batch 1 top-2: user 2 (225), user 1 (150)
      val b1 = spark.table("topk_stream").as[Streams.TopUser].collect().toSeq
      assert(b1.map(t => (t.rank, t.user_id, t.total_cents)) ==
        Seq((1, 2L, 225L), (2, 1L, 150L)))
      // batch 2: user 3 accumulates past both (state carried over)
      mem.addData(Event(4, ts("2024-01-01 10:10:00"), 3, "click", 3.00))
      q.processAllAvailable()
      val all = spark.table("topk_stream").as[Streams.TopUser].collect().toSeq
      assert(all.drop(2).map(t => (t.rank, t.user_id, t.total_cents)) ==
        Seq((1, 3L, 375L), (2, 2L, 225L)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
