package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.FixtureApi
import graft.sources.v2.LiveAgentApiRegistry

class DataSourceV2Spec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val api = new FixtureApi(Map(
    "tickets" -> Seq(
      Seq("""{"id":"T1","subject":"s1","date_created":"2024-01-01"}""",
          """{"id":"T2","subject":"s2","date_created":"2024-01-05"}"""),
      Seq("""{"id":"T3","subject":"s3","date_created":"2024-02-01"}"""))))

  private def read() = {
    LiveAgentApiRegistry.register("fix", api)
    spark.read.format("graft.sources.v2.LiveAgentTableProvider")
      .option("apiRef", "fix").option("endpoint", "tickets")
      .option("filterField", "date_created").option("maxPages", "4")
      .load()
  }

  test("DSv2 read: pages parallelize into partitions, all rows arrive") {
    val df = read()
    assert(df.count() == 3)
    assert(df.select("id").orderBy("id").collect().map(_.getString(0)).toSeq ==
      Seq("T1", "T2", "T3"))
  }

  test("DSv2 column pruning reaches the scan") {
    val df = read().select("id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(df.columns.toSeq == Seq("id"))
    assert(df.count() == 3)
  }

  test("DSv2 filter pushdown: window predicate lands in the scan AND stays Spark-side") {
    val df = read().where(col("date_created") >= "2024-01-02")
    // pushed into the scan description…
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("D>=") || desc.contains("_filters"),
      s"expected pushed _filters in plan:\n$desc")
    // …and still correct even though the fixture API ignores _filters
    // (the connector keeps pushed filters Spark-side: advisory pushdown)
    assert(df.select("id").orderBy("id").collect().map(_.getString(0)).toSeq ==
      Seq("T2", "T3"))
  }

  test("DSv2 LIMIT pushdown: a limit fetches only the pages it needs") {
    // JVM-static page log: the api object is SERIALIZED into each task,
    // so instance state would record into copies — the static log is the
    // one shared ledger across driver probe and task fetches
    LiveAgentApiRegistry.register("counting", new V2CountingApi)
    val df = spark.read.format("graft.sources.v2.LiveAgentTableProvider")
      .option("apiRef", "counting").option("endpoint", "x")
      .option("maxPages", "4").option("pageSize", "2")
      .load()
    V2CountingApi.fetched.clear() // drop the schema-inference probe
    val rows = df.limit(3).collect()
    assert(rows.length == 3)
    // ⌈3/2⌉ = 2 pages — pages 3 and 4 never fetched
    val pages = V2CountingApi.fetched
      .toArray(Array.empty[Integer]).map(_.toInt).toSet
    assert(pages == Set(1, 2), s"fetched pages $pages, expected {1, 2}")
    // and the limit shows in the scan description
    val desc = df.limit(3).queryExecution.executedPlan.toString
    assert(desc.contains("limit=3"), s"limit not in scan description:\n$desc")
  }
}

/** 4 pages of 2 rows; every fetch logs its page number JVM-statically. */
class V2CountingApi extends graft.sources.LiveAgentApi {
  override def fetchPage(endpoint: String, page: Int, perPage: Int,
                         filters: Map[String, String]) = {
    V2CountingApi.fetched.add(page)
    Right(if (page <= 4)
      Seq(s"""{"id":"P$page-a"}""", s"""{"id":"P$page-b"}""")
    else Seq.empty)
  }
}

object V2CountingApi {
  val fetched = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
}
