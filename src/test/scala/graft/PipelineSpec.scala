package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{FallbackLlmGateway, LlmExtract, LlmGateway, MockLlmGateway}
import graft.operators.Warehouse
import graft.pipeline.Pipelines
import graft.sources._

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def fixtureApi = new FixtureApi(Map(
    "tickets" -> Seq(
      Seq("""{"id":"T1","subject":"s1","tags":["a","b"],"date_created":"2024-01-01 02:00:00"}""",
          """{"id":"T2","subject":"s2","tags":[],"date_created":"2024-01-02 03:00:00"}"""),
      Seq("""{"id":"T3","subject":"s3","tags":["c"],"date_created":"2024-01-03 04:00:00"}""")),
    "agents" -> Seq(Seq("""{"id":"A1","name":"Alice"}""", """{"id":"A2","name":"Bob"}""")),
    "tags"   -> Seq(Seq("""{"id":"g1","name":"vip"}"""))))

  test("S1 pagination: loops pages, stops on empty; S4 tags→CSV") {
    val df = LiveAgentSource.paginate(spark, fixtureApi, "tickets")
    assert(df.count() == 3)
    val processed = LiveAgentSource.processTickets(df)
    val tags = processed.orderBy("id").select("tags").as[String].collect().toSeq
    assert(tags == Seq("a,b", "", "c"))
  }

  test("S6 flatten: group × inner messages, empty group kept (explode_outer)") {
    val groups = Seq(
      ("g1", "T1", Seq(("m1", "hello"), ("m2", "world"))),
      ("g2", "T2", Seq.empty[(String, String)]))
      .toDF("id", "ticket_id", "messages")
      .withColumn("messages", transform(col("messages"),
        m => struct(m.getField("_1").as("mid"), m.getField("_2").as("body"))))
    val flat = LiveAgentSource.flattenMessageGroups(groups)
    assert(flat.count() == 3) // 2 inner + 1 empty-group row
    assert(flat.columns.contains("message_mid") && flat.columns.contains("message_body"))
    val empty = flat.where(col("ticket_id") === "T2").collect().head
    assert(empty.isNullAt(flat.columns.indexOf("message_mid")))
  }

  test("X1 LLM extraction: mock gateway, field whitelist, token count") {
    val convos = Seq(("T1", "please purchase something nice")).toDF("ticket_id", "convo")
    val got = LlmExtract.extract(convos, "ticket_id", "convo", new MockLlmGateway)
    val row = got.collect().head
    assert(got.columns.toSeq == Seq("ticket_id") ++ LlmExtract.DefaultFields ++ Seq("tokens", "model"))
    assert(row.getAs[String]("intent_rating") == "purchase")
    assert(row.getAs[Long]("tokens") == 4L)
    assert(row.getAs[String]("model") == "mock-model")
  }

  test("X4 single-pass metrics: Observation rides the sink job, no second scan") {
    val df = Seq(("a", 1), (null: String, 2), ("c", 3)).toDF("id", "v")
    val (tagged, obs) = Pipelines.observed(df, "id")
    tagged.write.mode("overwrite").format("noop").save() // the one and only job
    val m = obs.get
    assert(m("n_rows") == 3L && m("null_keys") == 1L)
  }

  test("X1 fallback chain: first failure falls through; total failure → sentinel row") {
    class Failing extends LlmGateway {
      var calls = 0
      def extract(c: String) = { calls += 1; sys.error("model down") }
    }
    val primary = new Failing
    // primary fails → secondary answers, marked with its own model name
    val chained = new FallbackLlmGateway(Seq(primary, new MockLlmGateway))
    val ok = chained.extract("please purchase something nice")
    assert(primary.calls == 1 && ok.model == "mock-model")

    // every delegate fails → reference sentinel: null fields,
    // model=fallback_error, tokens counted on the prompt
    val allFail = new FallbackLlmGateway(Seq(new Failing, new Failing))
    val convos = Seq(("T1", "three word convo")).toDF("ticket_id", "convo")
    val row = LlmExtract.extract(convos, "ticket_id", "convo", allFail).collect().head
    assert(row.getAs[String]("model") == "fallback_error")
    assert(row.getAs[Long]("tokens") == 3L)
    LlmExtract.DefaultFields.foreach(f =>
      assert(row.isNullAt(row.fieldIndex(f)), s"$f should be null"))
  }

  test("full lifecycle: dims → tickets upsert → convo analysis → metrics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val wh = new Warehouse(spark, dir)
    val p = new Pipelines(spark, wh, fixtureApi, new MockLlmGateway)

    assert(p.refreshAgents() == 2)
    assert(p.refreshTags() == 1)
    val n = p.processTickets("date_created", "2024-01-01", "2024-02-01",
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), Seq("subject", "tags"))
    assert(n == 3 && wh.read("tickets").count() == 3)

    // second run is an upsert: same keys, no duplicates
    p.processTickets("date_created", "2024-01-01", "2024-02-01",
      java.sql.Timestamp.valueOf("2024-02-02 00:00:00"), Seq("subject", "tags"))
    assert(wh.read("tickets").count() == 3)

    val messages = Seq(
      ("T1", "client", "I am in quezon city area", "2024-01-01 10:00:00"),
      ("T1", "agent", "noted, purchase confirmed", "2024-01-01 10:05:00"))
      .toDF("ticket_id", "sender_type", "message", "datecreated")
      .withColumn("datecreated", to_timestamp(col("datecreated")))
    val ref = Seq(Tuple1("quezon city"), Tuple1("makati")).toDF("ref_name")
    val svc = Seq(Tuple1("quezon city")).toDF("svc_name")
    val cnt = p.processConvos(messages, ref, "ref_name", svc, "svc_name",
      updateCols = graft.pipeline.ColumnContracts.ConvoUpdateColumns.filter(Seq("summary","intent_rating","location").contains))
    assert(cnt == 1)
    assert(wh.read("convo_analysis").count() == 1)
    assert(wh.read("convo_analysis_history").count() == 1)

    val (newK, updK) = p.metrics(Seq("T1", "T9").toDF("id"), "tickets", "id")
    assert(newK == 1 && updK == 1)
  }

  test("rate limiter: enforces launch spacing") {
    val rl = new RateLimiter(2, 30)
    val t0 = System.nanoTime()
    (1 to 4).foreach { _ => rl.acquire(); rl.release() }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 85) // 4 launches, 30ms spacing → ≥ 90ms ideal (slack for timer)
  }

  test("convo MERGE asymmetry: contact_num/payment staged but never updated") {
    import graft.pipeline.ColumnContracts
    // reference fidelity: both fields are in the LLM whitelist…
    assert(ColumnContracts.LlmExpectedFields.contains("contact_num"))
    assert(ColumnContracts.LlmExpectedFields.contains("payment"))
    // …but excluded from the convo MERGE update list
    assert(!ColumnContracts.ConvoUpdateColumns.contains("contact_num"))
    assert(!ColumnContracts.ConvoUpdateColumns.contains("payment"))

    val target = Seq(("T1", "orig-num", "cash", "old summary"))
      .toDF("ticket_id", "contact_num", "payment", "summary")
    val staging = Seq(
      ("T1", "NEW-NUM", "card", "new summary"),
      ("T2", "fresh-num", "gcash", "fresh"))
      .toDF("ticket_id", "contact_num", "payment", "summary")
    val merged = graft.operators.Upsert.merge(target, staging, "ticket_id",
        updateCols = ColumnContracts.ConvoUpdateColumns)
      .orderBy("ticket_id")
      .as[(String, String, String, String)].collect().toSeq
    assert(merged == Seq(
      ("T1", "orig-num", "cash", "new summary"), // summary updated, asymmetric cols kept
      ("T2", "fresh-num", "gcash", "fresh")))    // insert takes all columns
  }
}
