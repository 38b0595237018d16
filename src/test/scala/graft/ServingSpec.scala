package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Warehouse
import graft.serving.Serving

class ServingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshWh() = {
    val dir = java.nio.file.Files.createTempDirectory("graft-serving").toString
    new Warehouse(spark, dir)
  }

  test("fetch: non-whitelisted table is a 404, whitelisted-but-absent is an error envelope") {
    val wh = freshWh()
    // outside the whitelist → HTTP-level rejection (tables.py:18-19)
    assert(Serving.fetch(wh, "users") == Left(Serving.HttpError(404, "Table not found!")))
    assert(Serving.fetch(wh, "secrets; DROP") == Left(Serving.HttpError(404, "Table not found!")))
    // whitelisted but not yet loaded → reference error envelope, not a throw
    val env = Serving.fetch(wh, "tickets").toOption.get
    assert(env.status == Serving.Error && env.count == "0" && env.data.isEmpty)
    assert(env.message.contains("Table not found!"))
  }

  test("fetch: limit passthrough, success envelope, limit reaches the plan, ONE job") {
    val wh = freshWh()
    // single data file: CollectLimit's incremental executeCollect satisfies
    // the limit from the first partition, making "exactly one job" exact
    wh.overwrite("tickets",
      (1 to 100).map(i => (s"T$i", s"s$i")).toDF("id", "subject").repartition(1))
    // the limit must be IN the executed plan (CollectLimit/GlobalLimit) —
    // serving a preview must not scan the whole table. fetch() executes
    // exactly this plan, so pin it on the same read it runs.
    val plan = wh.read("tickets").limit(10).queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit") || plan.contains("GlobalLimit"),
      s"limit not pushed into the plan:\n$plan")
    // fetch runs ONE data job (the collect; parquet schema inference adds a
    // driver metadata job we don't count); the envelope's page is a local
    // relation, so the serving edge's own count/collect launches ZERO
    // further jobs — previously `page.count()` + the caller's collect
    // scanned twice.
    val collects = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.stageInfos.exists(_.name.startsWith("collect")))
          collects.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val env = Serving.fetch(wh, "tickets", limit = 10).toOption.get
      assert(env.status == Serving.Success && env.count == "10")
      val page = env.data.get
      assert(page.collect().length == 10) // LocalTableScan.executeCollect: no job
      assert(page.columns.toSeq == Seq("id", "subject"))
      // listener events are async: wait for the first collect event, then a
      // grace window to catch any (unexpected) second one
      val deadline = System.nanoTime() + 2_000_000_000L
      while (collects.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(250)
      assert(collects.get() == 1,
        s"fetch+read ran ${collects.get()} collect jobs, expected 1")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("tokenTotals: per-model sums inside the window; empty window → (N/A, 0)") {
    val convo = Seq(
      ("T1", "gpt-a", 10L, "2024-01-01 01:00:00"),
      ("T2", "gpt-a", 5L, "2024-01-01 02:00:00"),
      ("T3", "gpt-b", 7L, "2024-01-01 03:00:00"),
      ("T4", "gpt-a", 99L, "2024-02-01 00:00:00")) // outside window
      .toDF("ticket_id", "model", "tokens", "date_extracted")
      .withColumn("date_extracted", col("date_extracted").cast("timestamp_ntz"))
    val got = Serving.tokenTotals(convo, "2024-01-01 00:00:00", "2024-01-02 00:00:00")
      .orderBy("model").as[(String, Long)].collect().toSeq
    assert(got == Seq(("gpt-a", 15L), ("gpt-b", 7L)))
    val empty = Serving.tokenTotals(convo, "2030-01-01 00:00:00", "2030-01-02 00:00:00")
      .as[(String, Long)].collect().toSeq
    assert(empty == Seq(("N/A", 0L)))
  }

  test("runtimeSummary: one conditional aggregation, app status from end-time") {
    val routes = Seq(
      ("agents", "completed"), ("tags", "completed"),
      ("tickets", "failed"), ("convo", "in_progress"), ("logs", "not_started"))
      .toDF("route", "status")
    val row = Serving.runtimeSummary(routes, totalErrors = 3, appEnded = false)
      .collect().head
    assert(row.getAs[Long]("total_routes") == 5)
    assert(row.getAs[Long]("completed_routes") == 2)
    assert(row.getAs[Long]("failed_routes") == 1)
    assert(row.getAs[Long]("in_progress_routes") == 1)
    assert(row.getAs[Long]("not_started_routes") == 1)
    assert(row.getAs[Long]("total_errors") == 3)
    assert(row.getAs[String]("app_status") == "running")
    val done = Serving.runtimeSummary(routes, 0, appEnded = true).collect().head
    assert(done.getAs[String]("app_status") == "completed")
  }
}
