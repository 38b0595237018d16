package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.streaming.Streams.Event

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed counts: tumbling 1h with watermark (streaming end-to-end)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = Streams.windowedCounts(mem.toDF(), "1 hour", "30 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:50:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 11:10:00"), 1, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), "click", 2L),
        (ts("2024-01-01 11:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("streaming windowed top-k: bounded TopKAgg inside the stateful agg, ranks across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val top = Streams.windowedTopK(mem.toDF(), k = 2)
    val q = top.writeStream.outputMode("complete")
      .format("memory").queryName("topk_out").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 5.0),
        Event(2, ts("2024-01-01 10:10:00"), 2, "click", 9.0),
        Event(3, ts("2024-01-01 10:15:00"), 3, "view", 1.0))
      q.processAllAvailable()
      // a later micro-batch delivers a new per-window maximum: the stored
      // top-k state must merge, not restart
      mem.addData(Event(4, ts("2024-01-01 10:20:00"), 4, "view", 7.0))
      q.processAllAvailable()
      val rows = spark.table("topk_out")
        .select("window_start", "rank", "event_id", "value")
        .as[(Timestamp, Int, Long, Double)].collect().toSet
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), 1, 2L, 9.0),
        (ts("2024-01-01 10:00:00"), 2, 4L, 7.0)))
    } finally q.stop()
  }

  test("streaming TV drift: matching window reads 0, alien-type window reads 1") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    // reference profile: 2/3 click, 1/3 view
    val drift = Streams.streamTvDrift(mem.toDF(),
      Map("click" -> 2L, "view" -> 1L), "1 hour", "30 minutes")
    val q = drift.writeStream.outputMode("complete")
      .format("memory").queryName("drift_out").start()
    try {
      mem.addData(
        // 10:00 window matches the reference distribution exactly
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 2, "click", 1.0),
        Event(3, ts("2024-01-01 10:15:00"), 3, "view", 1.0),
        // 11:00 window is all types the reference has never seen
        Event(4, ts("2024-01-01 11:05:00"), 4, "error", 1.0),
        Event(5, ts("2024-01-01 11:10:00"), 5, "error", 1.0),
        // 12:00 window half-matches: all click (ref share 2/3) → tv 1/3
        Event(6, ts("2024-01-01 12:05:00"), 6, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("drift_out")
        .select("window_start", "n", "tv").as[(Timestamp, Long, Double)]
        .collect().map { case (w, n, tv) => (w, n, tv) }.toSet
      assert(rows == Set(
        (ts("2024-01-01 10:00:00"), 3L, 0.0),
        (ts("2024-01-01 11:00:00"), 2L, 1.0),
        (ts("2024-01-01 12:00:00"), 1L, 1.0 / 3.0)))
    } finally q.stop()
  }

  test("dedup within watermark: re-delivered keys dropped, state bounded") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val dd = Streams.dedupStream(mem.toDF(), Seq("event_id"), "ts", "30 minutes")
    val q = dd.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:05"), 1, "click", 1.0), // re-delivery
        Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      mem.addData( // same batch key dup + advance watermark past horizon
        Event(2, ts("2024-01-01 10:02:00"), 2, "view", 2.0), // re-delivery
        Event(3, ts("2024-01-01 11:30:00"), 3, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("sessionize: 30-min gap splits sessions; state emits on timeout") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = mem.toDS().withWatermark("ts", "10 minutes").as[Event]
    val sessions = Streams.sessionize(events, gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 7, "view", 1.0),
        // > 30 min gap → new session
        Event(3, ts("2024-01-01 11:00:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // advance watermark far enough to time out the open session
      mem.addData(Event(9, ts("2024-01-01 13:00:00"), 8, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Event(10, ts("2024-01-01 15:00:00"), 8, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "session_start", "n_events")
        .as[(Long, Timestamp, Long)].collect().toSet
      assert(rows.contains((7L, ts("2024-01-01 10:00:00"), 2L)))
      assert(rows.contains((7L, ts("2024-01-01 11:00:00"), 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join: bounded lookback, state evicted by watermark") {
    implicit val sq = spark.sqlContext
    val errs = MemoryStream[Event]
    val purch = MemoryStream[Event]
    val joined = Streams.intervalJoin(
      errs.toDF().select(col("event_id").as("err_id"), col("ts").as("err_ts"),
        col("user_id").as("err_user")),
      purch.toDF().select(col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("user_id").as("p_user")),
      keys = Seq(("err_user", "p_user")), leftTs = "err_ts", rightTs = "p_ts",
      lookback = "1 hour", watermark = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      purch.addData(
        Event(100, ts("2024-01-01 10:00:00"), 1, "purchase", 5.0),
        Event(101, ts("2024-01-01 10:40:00"), 1, "purchase", 6.0),
        Event(102, ts("2024-01-01 08:00:00"), 1, "purchase", 7.0), // too old
        Event(103, ts("2024-01-01 10:30:00"), 2, "purchase", 8.0)) // other user
      errs.addData(Event(1, ts("2024-01-01 10:45:00"), 1, "error", 0.0))
      q.processAllAvailable()
      val got = spark.table("ij_out").select("err_id", "p_id")
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L), (1L, 101L)))
    } finally q.stop()
  }

  test("idempotent foreachBatch: replayed batchId applies its effect once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idem-wh").toString
    val wh = new graft.operators.Warehouse(spark, dir)
    def applyBatch(id: Long, rows: Seq[(String, Int)]): Boolean =
      Streams.idempotentBatch(wh, "t")(id) {
        wh.upsert("t", rows.toDF("id", "v"), "id", Seq("v"))
      }
    assert(applyBatch(0, Seq(("a", 1))))
    assert(applyBatch(1, Seq(("a", 5), ("b", 2))))
    // crash-before-checkpoint: the engine re-delivers batch 1 — with
    // DIFFERENT recomputed content semantics the effect must still be
    // skipped because batch 1 already committed
    assert(!applyBatch(1, Seq(("a", 999), ("c", 7))))
    val got = wh.read("t").orderBy("id").as[(String, Int)].collect().toSeq
    assert(got == Seq(("a", 5), ("b", 2)))
  }

  test("partition-scoped streaming upsert sink: micro-batch merges touch only their partitions") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-upp-sink").toString
    val wh = new graft.operators.Warehouse(spark, dir)
    // pre-existing partitioned target: two date partitions
    wh.overwritePartitioned("ev",
      Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0))
        .toDF("dt", "id", "v"), Seq("dt"))
    val snapBefore = wh.snapshots("ev").last
    val mem = MemoryStream[(String, Long, Double)]
    val q = Streams.upsertSinkPartitioned(
      mem.toDF().toDF("dt", "id", "v"), wh, "ev", "id", Seq("v"),
      Seq("dt")).start()
    try {
      // the batch touches only 2024-01-02: update id=2, insert id=3
      mem.addData(("2024-01-02", 2L, 22.0), ("2024-01-02", 3L, 33.0))
      q.processAllAvailable()
      val got = wh.read("ev").select("dt", "id", "v")
        .as[(String, Long, Double)].collect().toSet
      assert(got == Set(("2024-01-01", 1L, 10.0),
        ("2024-01-02", 2L, 22.0), ("2024-01-02", 3L, 33.0)))
      // the untouched partition carried over by hardlink (same inode)
      val snapAfter = wh.snapshots("ev").last
      val untouched = wh.dataFiles("ev").filter(_.startsWith("dt=2024-01-01"))
      assert(untouched.nonEmpty)
      untouched.foreach { rel =>
        assert(java.nio.file.Files.isSameFile(
          java.nio.file.Paths.get(dir, "ev", snapBefore, rel),
          java.nio.file.Paths.get(dir, "ev", snapAfter, rel)),
          s"$rel was rewritten by a batch that never touched it")
      }
    } finally q.stop()
  }

  test("streaming messages leg: stream-static enrichment, broadcast join, append sink") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-enrich").toString
    val wh = new graft.operators.Warehouse(spark, dir)
    val agents = Seq(("A1", "Alice")).toDF("id", "name")
    val mem = MemoryStream[(String, String, String, String)]
    val flat = mem.toDF().toDF("message_id", "userid", "agentid", "owner_name")
    // MessageEnrich is a pure frame → frame operator, so the same code runs
    // on a streaming frame as a stream-static broadcast join — the
    // streaming form of the §3.1 messages leg
    val enriched = graft.pipeline.MessageEnrich.enrich(flat, agents,
      graft.pipeline.MessageEnrich.Ids("sys", "sp", "BrandCo"))
    val q = enriched.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        wh.append("messages_stream", batch.toDF())
    }.start()
    try {
      mem.addData(("m1", "A1", "A1", "Own"), ("m2", "C9", "A1", "Own"))
      q.processAllAvailable()
      mem.addData(("m3", "sp", "A1", "Own"))
      q.processAllAvailable()
      val got = wh.read("messages_stream")
        .select("message_id", "sender_name", "sender_type", "receiver_name")
        .as[(String, String, String, String)].collect()
        .map(r => r._1 -> r).toMap
      assert(got("m1") == (("m1", "Alice", "agent", "Own")))
      assert(got("m2") == (("m2", "Own", "client", "Alice")))
      assert(got("m3") == (("m3", "BrandCo", "system", "Own")))
    } finally q.stop()
  }

  test("streaming upsert sink: foreachBatch merges into warehouse table") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-wh").toString
    val wh = new graft.operators.Warehouse(spark, dir)
    val mem = MemoryStream[(String, Int)]
    val df = mem.toDF().toDF("id", "v")
    val q = Streams.upsertSink(df, wh, "t", "id", Seq("v")).start()
    try {
      mem.addData(("a", 1), ("b", 2)); q.processAllAvailable()
      mem.addData(("b", 99), ("c", 3)); q.processAllAvailable()
      val got = wh.read("t").orderBy("id").as[(String, Int)].collect().toSeq
      assert(got == Seq(("a", 1), ("b", 99), ("c", 3)))
    } finally q.stop()
  }
}
