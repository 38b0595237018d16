package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{FallbackLlmGateway, LlmExtract, LlmGateway, MockLlmGateway}
import graft.operators.Warehouse
import graft.pipeline.{MessageEnrich, Pipelines}
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
      updateCols = graft.pipeline.ColumnContracts.ConvoUpdateColumns.filter(Seq("summary","intent_rating","location").contains),
      runTs = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(cnt == 1)
    assert(wh.read("convo_analysis").count() == 1)
    assert(wh.read("convo_analysis_history").count() == 1)
    // post-processing parity (Extractor.py:293-298 + extraction_helpers
    // convert_schedule_fields): geocode working columns dropped, address +
    // run stamp kept, schedule_date typed as a datetime
    val convoCols = wh.read("convo_analysis").columns.toSet
    assert(!convoCols.contains("score") && !convoCols.contains("accepted"))
    assert(convoCols.contains("address") && convoCols.contains("date_extracted"))
    assert(wh.read("convo_analysis").schema("schedule_date").dataType.typeName
      .startsWith("timestamp"))

    val (newK, updK) = p.metrics(Seq("T1", "T9").toDF("id"), "tickets", "id")
    assert(newK == 1 && updK == 1)
  }

  test("§3.1 tickets MERGE is partition-scoped: untouched day-partitions carry over inode-identical; scan prunes; pre-partitioning table migrates once") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-part").toString
    val wh = new Warehouse(spark, dir)
    val pcol = Pipelines.TicketsPartitionCol

    // seed a LEGACY standing table the old whole-table path would have
    // written: unpartitioned, no partition column — the migration probe
    val legacyApi = new FixtureApi(Map("tickets" -> Seq(Seq(
      """{"id":"T1","subject":"s1","tags":["a"],"date_created":"2024-01-01 02:00:00"}""",
      """{"id":"T2","subject":"s2","tags":[],"date_created":"2024-01-02 03:00:00"}"""))))
    val legacy = LiveAgentSource.processTickets(
      LiveAgentSource.paginate(spark, legacyApi, "tickets"))
    wh.overwrite("tickets", legacy)
    assert(!wh.read("tickets").columns.contains(pcol))

    // first lifecycle batch: migrates the layout once, then scopes
    val p = new Pipelines(spark, wh, legacyApi, new MockLlmGateway)
    p.processTickets("date_created", "2024-01-01", "2024-02-01",
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), Seq("subject", "tags"))
    assert(wh.read("tickets").columns.contains(pcol))
    assert(wh.read("tickets").count() == 2)
    val snapBefore = wh.snapshots("tickets").last
    val dayOf = wh.read("tickets").select(col("id"), col(pcol).cast("string"))
      .as[(String, String)].collect().toMap
    assert(dayOf("T1") != dayOf("T2"), "fixture days must differ")

    // second batch touches ONLY T2's day (an update + an insert that day)
    val day2Api = new FixtureApi(Map("tickets" -> Seq(Seq(
      """{"id":"T2","subject":"s2-upd","tags":["x"],"date_created":"2024-01-02 03:00:00"}""",
      """{"id":"T9","subject":"s9","tags":[],"date_created":"2024-01-02 09:00:00"}"""))))
    new Pipelines(spark, wh, day2Api, new MockLlmGateway)
      .processTickets("date_created", "2024-01-01", "2024-02-01",
        java.sql.Timestamp.valueOf("2024-02-02 00:00:00"), Seq("subject", "tags"))

    // merge semantics held: T1 untouched, T2 updated, T9 inserted
    val got = wh.read("tickets").select("id", "subject")
      .as[(String, String)].collect().toMap
    assert(got == Map("T1" -> "s1", "T2" -> "s2-upd", "T9" -> "s9"))

    // T1's day-partition carried over by HARDLINK (same inode — the
    // whole-table path would have rewritten every row)
    val snapAfter = wh.snapshots("tickets").last
    assert(snapAfter != snapBefore)
    val untouched = wh.dataFiles("tickets")
      .filter(_.startsWith(s"$pcol=${dayOf("T1")}"))
    assert(untouched.nonEmpty, "T1's partition must exist")
    untouched.foreach { rel =>
      assert(java.nio.file.Files.isSameFile(
        java.nio.file.Paths.get(dir, "tickets", snapBefore, rel),
        java.nio.file.Paths.get(dir, "tickets", snapAfter, rel)),
        s"$rel was rewritten — the lifecycle merge is not partition-scoped")
    }

    // and the layout prunes: a day predicate reaches the scan as a
    // PARTITION filter (directory pruning — what the scoped MERGE's
    // target read rides on every batch)
    val q = wh.read("tickets").where(col(pcol) === dayOf("T2"))
    q.collect()
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(scan.partitionFilters.nonEmpty,
      "day predicate must prune partitions on the tickets table")
  }

  /** Driver-side API wrapper recording every endpoint hit — lets the specs
    * assert WHICH fetches happened (cache-miss discipline), not just the
    * resulting frames.
    */
  private class CountingApi(delegate: LiveAgentApi) extends LiveAgentApi {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    override def fetchPage(endpoint: String, page: Int, perPage: Int,
                           filters: Map[String, String]) = {
      calls += s"$endpoint#$page"
      delegate.fetchPage(endpoint, page, perPage, filters)
    }
  }

  test("S5 keyed fetch: pages per ticket, cache hit beats fallback, failed ticket skipped") {
    val api = new CountingApi(new FixtureApi(Map(
      "tickets/T1/messages" -> Seq(
        Seq("""{"id":"g1","userid":"U1","messages":[{"mid":"m1","message":"hello"}]}"""),
        Seq("""{"id":"g2","userid":"A1","messages":[{"mid":"m2","message":"hi"}]}""")),
      "tickets/T3/messages" -> Seq(
        Seq("""{"id":"g3","userid":"U2","messages":[{"mid":"m3","message":"yo"}]}""")))))
    val cache = Seq(("T1", "Cache Owner", "A9")).toDF("ticket_id", "owner_name", "agentid")
    val groups = LiveAgentSource.fetchTicketMessages(spark, api,
      Seq(TicketRef("T1", agentId = Some("FBA"), ownerName = Some("FB Owner")),
          TicketRef("T2", agentId = Some("FBA2"), ownerName = Some("FB2")), // 404 → skipped
          TicketRef("T3", agentId = Some("A3"), ownerName = None)),
      metadataCache = Some(cache))
    assert(groups.count() == 3) // 2 T1 groups + 1 T3 group; T2 dropped, batch survives
    // cache hit replaces metadata wholesale (Ticket.py:96-106)
    val t1 = groups.where(col("ticket_id") === "T1").select("owner_name", "agentid")
      .distinct().as[(String, String)].collect().toSeq
    assert(t1 == Seq(("Cache Owner", "A9")))
    // cache miss → per-ticket fallback args (None → NULL)
    val t3 = groups.where(col("ticket_id") === "T3").select("owner_name", "agentid")
      .as[(String, String)].collect().head
    assert(t3 == ((null, "A3")))
    // pagination: T1 paged until empty (pages 1,2,3-empty), T3 until empty (1,2-empty)
    assert(api.calls.count(_.startsWith("tickets/T1/messages")) == 3)
    assert(api.calls.count(_.startsWith("tickets/T3/messages")) == 2)
  }

  test("S5 keyed fetch: group fields clashing with the envelope lose to it") {
    // the group object claims its own ticket_id/owner_name — base_info
    // semantics: the envelope's values win, no ambiguous-column failure
    val api = new FixtureApi(Map(
      "tickets/T9/messages" -> Seq(Seq(
        """{"id":"g1","ticket_id":"SPOOF","owner_name":"SPOOF","userid":"U1","messages":[]}"""))))
    val groups = LiveAgentSource.fetchTicketMessages(spark, api,
      Seq(TicketRef("T9", agentId = Some("A1"), ownerName = Some("Real Owner"))))
    val row = groups.select("ticket_id", "owner_name").as[(String, String)]
      .collect().head
    assert(row == (("T9", "Real Owner")))
  }

  test("X3 user point fetch: resolved rows only, absent fields NULL") {
    val api = new FixtureApi(Map(
      "users/U1" -> Seq(Seq("""{"name":"  ","email":"u1@x.ph","role":"V"}""")),
      "users/U2" -> Seq(Seq("""{"name":"Uma","email":"u2@x.ph"}"""))))
    val users = LiveAgentSource.fetchUsers(spark, api, Seq("U1", "U2", "U404"))
    assert(users.columns.toSeq == Seq("id", "name", "email", "role", "avatar_url"))
    assert(users.count() == 2) // U404 failed lookup → skipped, not fatal
    val u2 = users.where(col("id") === "U2").collect().head
    assert(u2.getAs[String]("role") == null && u2.getAs[String]("avatar_url") == null)
  }

  test("X3+J11+J2 refreshUsers: only cache misses fetched, J2 name resolution, idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-users").toString
    val wh = new Warehouse(spark, dir)
    val api = new CountingApi(new FixtureApi(Map(
      "users/U2" -> Seq(Seq("""{"name":" ","email":"u2@x.ph","role":"V"}""")))))
    val p = new Pipelines(spark, wh, api, new MockLlmGateway)
    wh.overwrite("users", Seq(("U1", "Known", "u1@x.ph", null: String, null: String))
      .toDF("id", "name", "email", "role", "avatar_url"))
    val agents = Seq(("A1", "Alice")).toDF("id", "name")
    val flat = Seq(
      ("A1", "A1"), // agent-authored → covered by agents dim, no fetch
      ("U1", "A1"), // already in users table → no fetch
      ("U2", "A1"), // genuine miss → fetched
      (null: String, "A1")) // NULL id never fetched
      .toDF("userid", "agentid")
    assert(p.refreshUsers(flat, agents) == 1)
    // exactly one point fetch: the miss (J11 anti-join against BOTH caches)
    assert(api.calls.toSeq == Seq("users/U2#1"))
    // J2: blank name → email
    val u2 = wh.read("users").where(col("id") === "U2").collect().head
    assert(u2.getAs[String]("name") == "u2@x.ph")
    assert(wh.read("users").count() == 2)
    // second pass: U2 now cached → zero fetches (reference preload semantics)
    assert(p.refreshUsers(flat, agents) == 0L)
    assert(api.calls.size == 1)
  }

  test("§3.1 end-to-end: recent keys → keyed fetch → flatten → enrich → append") {
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val wh = new Warehouse(spark, dir)
    val api = new CountingApi(new FixtureApi(Map(
      "agents" -> Seq(Seq("""{"id":"A1","name":"Alice"}""", """{"id":"55","name":"Raw Special"}""")),
      "tickets/T1/messages" -> Seq(Seq(
        """{"id":"g1","userid":"A1","messages":[{"mid":"m1","message":"Ref: ABC123 done"}]}""",
        """{"id":"g2","userid":"C7","messages":[{"mid":"m2","message":"client asks"}]}""",
        """{"id":"g3","userid":"55","messages":[{"mid":"m3","message":"auto"}]}""")),
      "users/C7" -> Seq(Seq("""{"name":"Cara","email":"c@x.ph"}""")))))
    val p = new Pipelines(spark, wh, api, new MockLlmGateway,
      ids = MessageEnrich.Ids("sys00", "55", "BrandCo"))
    p.refreshAgents()
    wh.overwrite("tickets", Seq(("T1", "Owen Owner", "A1"))
      .toDF("id", "owner_name", "agentid"))
    assert(p.processTicketMessages(Seq(TicketRef("T1"))) == 3)

    val msgs = wh.read("messages")
    // ticket metadata merged from the warehouse cache, sender/receiver CASE applied
    val bySender = msgs.select("message_mid", "sender_name", "sender_type",
        "receiver_name", "receiver_type", "agent_name")
      .as[(String, String, String, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(bySender("m1") == (("m1", "Alice", "agent", "Owen Owner", "client", "Alice")))
    assert(bySender("m2") == (("m2", "Owen Owner", "client", "Alice", "agent", "Alice")))
    // magic id wins over its agents-dimension row (precedence parity)
    assert(bySender("m3") == (("m3", "BrandCo", "system", "Owen Owner", "client", "Alice")))
    // the client author was point-fetched into the users dimension
    assert(api.calls.toSeq.contains("users/C7#1"))
    assert(wh.read("users").where(col("id") === "C7").count() == 1)
    // F1 reference-code extraction rode along; the body keeps its plain
    // name (Ticket.py:174), non-matching rows get the sentinel
    assert(msgs.where(col("message").contains("ABC123"))
      .select("reference_code").as[String].collect().head == "ABC123")
    assert(msgs.where(col("message_mid") === "m2")
      .select("reference_code").as[String].collect().head ==
      graft.functions.TextFns.NoReferenceCode)
  }

  test("enrich: duplicate agent-dim ids never fan out messages") {
    val flat = Seq(("A1", "A1", "Own")).toDF("userid", "agentid", "owner_name")
    val agents = Seq(("A1", "Alice"), ("A1", "Alice2")).toDF("id", "name")
    val got = graft.pipeline.MessageEnrich.enrich(flat, agents,
      graft.pipeline.MessageEnrich.Ids("s", "sp", "B"))
    // dict-cache semantics: one row per agent id, so one output row
    assert(got.count() == 1)
    assert(got.select("sender_type").as[String].collect().head == "agent")
  }

  test("messages append: duplicate-on-rerun parity default; dedupe flag drops re-deliveries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedupe").toString
    val wh = new Warehouse(spark, dir)
    val p = new Pipelines(spark, wh, fixtureApi, new MockLlmGateway)
    val groups = Seq(("g1", "T1", Seq(("m1", "hello"), ("m1", "hello"), ("m2", "hi"))))
      .toDF("id", "ticket_id", "messages")
      .withColumn("messages", transform(col("messages"),
        m => struct(m.getField("_1").as("id"), m.getField("_2").as("message"))))
    // reference-exact default: re-runs append duplicates (§2.8)
    assert(p.processMessages(groups) == 3)
    assert(p.processMessages(groups) == 3)
    assert(wh.read("messages").count() == 6)
    // opt-in dedupe: within-batch re-delivery collapsed, standing ids skipped
    assert(p.processMessages(groups, dedupe = true) == 0)
    val fresh = new Pipelines(spark,
      new Warehouse(spark, java.nio.file.Files.createTempDirectory("graft-dedupe2").toString),
      fixtureApi, new MockLlmGateway)
    assert(fresh.processMessages(groups, dedupe = true) == 2)
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
