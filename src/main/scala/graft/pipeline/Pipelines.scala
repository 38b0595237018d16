package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, TimeFns}
import graft.llm.{LlmExtract, LlmGateway}
import graft.operators.{Convo, GeocodeJoin, Warehouse}
import graft.sources.{LiveAgentApi, LiveAgentSource, RateLimiter, TicketRef}

/** The three §3 lifecycles as composable jobs over a Warehouse, plus the
  * metrics job — the engine-side equivalents of the reference's FastAPI
  * routes (SURVEY.md §3.1–§3.3; `api/app.py:45-55` ordering:
  * agents → tags → tickets → convo).
  */
final class Pipelines(spark: SparkSession, wh: Warehouse, api: LiveAgentApi,
                      llm: LlmGateway,
                      ids: MessageEnrich.Ids =
                        MessageEnrich.Ids("system-user", "special-user", "Brand"),
                      limiter: Option[RateLimiter] = None) {

  /** §3.3 — dimension refresh: fetch + tz-normalize + truncate-overwrite. */
  def refreshAgents(): Long = {
    val raw = LiveAgentSource.paginate(spark, api, "agents")
    if (raw.isEmpty) return 0L
    val processed =
      if (raw.columns.contains("last_pswd_change"))
        raw.withColumn("last_pswd_change",
          TimeFns.parseToManila(col("last_pswd_change")).cast("timestamp_ntz"))
      else raw
    wh.overwrite("agents", processed)
    processed.count()
  }

  def refreshTags(): Long = {
    val raw = LiveAgentSource.paginate(spark, api, "tags")
    if (raw.isEmpty) return 0L
    val filled = raw.na.fill("").na.fill(0)
    wh.overwrite("tags", filled)
    filled.count()
  }

  /** §3.1 — tickets + messages: fetch window → transform → upsert tickets
    * → fetch/flatten messages → enrich → append messages.
    * `tsCols` are tz-normalized (F2); `custom_fields` normalized (F4).
    *
    * The tickets MERGE is PARTITION-SCOPED ([[Warehouse.upsertPartitioned]]
    * over [[Pipelines.TicketsPartitionCol]] = day of `date_created`): a
    * ticket's creation time is assigned once by the source system and never
    * rewritten by the update path, so the stable-key-partition contract
    * holds by construction, and the 6-hourly batch — the reference's
    * most-executed MERGE (`extractor_bq_helpers.py:40-185` every 6 hours)
    * — joins a few day-partitions against the batch instead of
    * full-outer-joining the whole table: O(batch), not O(table), at 100 TB.
    * `users` and `convo_analysis` stay whole-table ([[refreshUsers]],
    * [[processConvos]]): a user row has no immutable time column (every
    * field can mutate, ids arrive unordered), and convo re-analysis may
    * update ANY historical ticket_id — neither satisfies the stable-key
    * precondition, so scoping them would strand stale rows.
    */
  def processTickets(windowField: String, start: String, end: String,
                     runTs: java.sql.Timestamp,
                     updateCols: Seq[String]): Long = {
    val raw = LiveAgentSource.paginate(spark, api, "tickets",
      LiveAgentSource.windowFilters(windowField, start, end))
    if (raw.isEmpty) return 0L
    var t = LiveAgentSource.processTickets(raw)
      .withColumn("datetime_extracted", lit(runTs).cast("timestamp_ntz"))
    for (c <- Seq("date_created", "date_changed", "date_resolved") if t.columns.contains(c))
      t = t.withColumn(c, TimeFns.parseToManila(col(c)).cast("timestamp_ntz"))
    if (t.columns.contains("custom_fields"))
      t = t.withColumn("custom_fields", TextFns.singleElementOrNull(col("custom_fields")))
    val standingCols =
      if (wh.exists("tickets")) wh.read("tickets").columns.toSeq else Nil
    if (t.columns.contains("date_created") &&
        (standingCols.isEmpty || standingCols.contains("date_created"))) {
      if (standingCols.nonEmpty &&
          !standingCols.contains(Pipelines.TicketsPartitionCol)) {
        // one-time layout migration of a pre-partitioning table: derive
        // the day column for the standing rows and rewrite partitioned —
        // the O(table) cost paid ONCE; every later batch is scoped
        wh.overwritePartitioned("tickets",
          wh.read("tickets").withColumn(Pipelines.TicketsPartitionCol,
            to_date(col("date_created"))),
          Seq(Pipelines.TicketsPartitionCol))
      }
      val staged = t.withColumn(Pipelines.TicketsPartitionCol,
        to_date(col("date_created")))
      wh.upsertPartitioned("tickets", staged, "id", updateCols,
        Seq(Pipelines.TicketsPartitionCol))
    } else
      // degenerate feed or standing table without a creation time: no
      // stable partition column exists, fall back to the whole-table merge
      wh.upsert("tickets", t, "id", updateCols)
    t.count()
  }

  /** Messages leg, TicketMessageProcessor parity
    * (`core/TicketMessageProcessor.py:262-291`): flatten groups (S6),
    * refresh the users dimension from the ids seen in this batch
    * (X3+J11+J2, [[refreshUsers]]), resolve sender/receiver via the J4
    * CASE over the agents dimension ([[MessageEnrich.enrich]]), extract
    * reference codes (F1), append (append-only — duplicates on rerun
    * preserved for parity, §2.8).
    *
    * `dedupe = true` is the SURVEY §7.3 opt-in hardening of the
    * reference's duplicate-on-rerun behavior: drop batch rows whose
    * `message_id` already landed (left_anti against the standing table —
    * one key-projected scan, no full-table rewrite) and within-batch
    * re-deliveries. Default stays reference-exact.
    */
  def processMessages(groups: DataFrame, dedupe: Boolean = false): Long = {
    // the reference keeps the inner body's plain name — every other inner
    // field gets the message_ prefix (`core/Ticket.py:170-181`)
    val flat0 = LiveAgentSource.flattenMessageGroups(groups)
    val flat =
      if (flat0.columns.contains("message_message") && !flat0.columns.contains("message"))
        flat0.withColumnRenamed("message_message", "message")
      else flat0
    val agents =
      if (wh.exists("agents")) wh.read("agents").select(col("id"), col("name"))
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType))))
    refreshUsers(flat, agents)
    val enriched = MessageEnrich.enrich(flat, agents, ids)
    val coded =
      if (enriched.columns.contains("message"))
        enriched.withColumn("reference_code",
          TextFns.extractReferenceCode(col("message")))
      else enriched
    val out =
      if (dedupe && coded.columns.contains("message_id")) {
        val batch = coded.dropDuplicates("message_id")
        if (wh.exists("messages"))
          batch.join(wh.read("messages").select(col("message_id")),
            Seq("message_id"), "left_anti")
        else batch
      } else coded
    wh.append("messages", out)
    out.count()
  }

  /** §3.1 middle leg, end-to-end (S5+S6+J3+J4): recent ticket keys →
    * per-key message fetch under the rate limiter → flatten → enrich →
    * append. The ticket metadata cache is the warehouse `tickets` table
    * (the reference caches the same fields during the tickets fetch,
    * `core/Ticket.py:64-71`).
    */
  def processTicketMessages(tickets: Seq[TicketRef],
                            maxPagesPerTicket: Int = LiveAgentSource.MaxPages): Long = {
    val cache =
      if (wh.exists("tickets")) {
        val t = wh.read("tickets")
        // processTickets defaults these columns, but a hand-loaded tickets
        // table may lack them — no cache beats an AnalysisException
        if (Seq("id", "owner_name", "agentid").forall(t.columns.contains))
          Some(t.select(col("id").as("ticket_id"),
            col("owner_name"), col("agentid")))
        else None
      } else None
    val groups = LiveAgentSource.fetchTicketMessages(spark, api, tickets,
      limiter, maxPagesPerTicket, cache)
    if (groups.isEmpty) return 0L
    processMessages(groups)
  }

  /** X3 — users-dimension refresh from a message batch
    * (`TicketMessageProcessor.py:24-37,63-194`): distinct candidate ids
    * (userid ∪ message_userid ∪ agentid), minus ids already covered by
    * the agents dimension or the standing users table (J11 cache-miss
    * anti-join), point-fetched via `users/{id}` and upserted with J2 name
    * resolution. The collect is the cache-miss id set of ONE batch window
    * — bounded by construction (the fetch is per-id HTTP either way), and
    * guarded by `maxPointFetches`: a pathological batch (a backfill
    * missing its users preload) fails fast with the size instead of
    * grinding the rate-limited endpoint for days. Returns the number of
    * newly fetched users.
    */
  def refreshUsers(flat: DataFrame, agents: DataFrame,
                   maxPointFetches: Long = 100000L): Long = {
    val idCols = Seq("userid", "message_userid", "agentid")
      .filter(flat.columns.contains)
    if (idCols.isEmpty) return 0L
    val seen = idCols.map(c => flat.select(col(c).cast("string").as("id")))
      .reduce(_ unionByName _).where(col("id").isNotNull).distinct()
    val notAgent = seen.join(
      agents.select(col("id").cast("string").as("id")), Seq("id"), "left_anti")
    val misses =
      if (wh.exists("users"))
        notAgent.join(wh.read("users").select(col("id").cast("string").as("id")),
          Seq("id"), "left_anti")
      else notAgent
    val missCount = misses.count()
    require(missCount <= maxPointFetches,
      s"refreshUsers: $missCount cache-miss ids exceed maxPointFetches=" +
        s"$maxPointFetches — preload the users dimension before this batch")
    val missIds = misses.collect().map(_.getString(0)).toSeq.sorted
    if (missIds.isEmpty) return 0L
    val fetched = LiveAgentSource.fetchUsers(spark, api, missIds, limiter)
    if (fetched.isEmpty) return 0L
    val resolved = fetched.withColumn("name",
      MessageEnrich.resolvedUserName(col("name"), col("email")))
    wh.upsert("users", resolved, "id", ColumnContracts.UsersUpdateColumns)
    resolved.count()
  }

  /** §3.2 — convo analysis: reassemble conversations (A6) → LLM extraction
    * (X1, injected gateway) → geocode-style match + serviceability tag
    * (J5–J8) → history append + upsert (K5+K4). Geocode results join back
    * on the key — the reference's positional concat (J12) is intentionally
    * replaced by a key join (SURVEY.md §7.3).
    */
  def processConvos(messages: DataFrame, refTable: DataFrame, refNameCol: String,
                    serviceable: DataFrame, svcNameCol: String,
                    updateCols: Seq[String],
                    runTs: java.sql.Timestamp =
                      java.sql.Timestamp.valueOf("1970-01-01 00:00:00")): Long = {
    val convos = Convo.conversationText(messages)
    val analysis = LlmExtract.extract(
      convos.select(col("ticket_id").cast("string").as("ticket_id"), col("convo")),
      "ticket_id", "convo", llm)
    val geo = GeocodeJoin.bestMatch(
        analysis.where(col("location") =!= "").select(col("ticket_id"), col("location")),
        refTable, "location", refNameCol, "ticket_id")
      .select(col("ticket_id"), col(refNameCol).as("address"),
        col("score"), col("accepted"))
    val tagged = GeocodeJoin.tagViable(
      analysis.join(geo, Seq("ticket_id"), "left"),
      serviceable, "location", svcNameCol)
    // post-extraction parity: stamp the run, convert the schedule fields
    // (F6, extraction_helpers.py:164-216 — schedule_date becomes a
    // DATETIME combining date + parsed time; schedule_time stays string),
    // then drop the geocode working columns and anything *metadata*
    // before load (Extractor.py:293-298).
    val stamped = tagged
      .withColumn("date_extracted", lit(runTs).cast("timestamp_ntz"))
      .withColumn("schedule_date",
        TimeFns.combineScheduleDateTime(col("schedule_date"), col("schedule_time"))
          .cast("timestamp_ntz"))
    val dropCols = Seq("score", "accepted", "input_address", "lat", "lng", "error") ++
      stamped.columns.filter(_.toLowerCase.contains("metadata"))
    val fin = stamped.drop(dropCols: _*)
    wh.append("convo_analysis_history", fin)
    wh.upsert("convo_analysis", fin, "ticket_id", updateCols)
    fin.count()
  }

  /** Metrics job (A1 + A8/J9/J10): new vs existing key counts and grouped
    * totals — `ExtractionLogger.py:95-176`.
    */
  def metrics(runKeys: DataFrame, table: String, key: String): (Long, Long) = {
    if (!wh.exists(table)) return (runKeys.count(), 0L)
    val existing = wh.read(table).select(col(key))
    val newCnt = runKeys.join(existing, Seq(key), "left_anti").count()
    val updCnt = runKeys.join(existing, Seq(key), "left_semi").count()
    (newCnt, updCnt)
  }
}

object Pipelines {
  /** Derived partition column of the warehouse `tickets` table: the DAY of
    * `date_created`. Creation time is written once by the source system
    * and never mutated, so a ticket's partition is stable for its key —
    * the [[graft.operators.Warehouse.upsertPartitioned]] precondition.
    */
  val TicketsPartitionCol = "date_created_day"

  /** X4 runtime metrics, single-pass form: the reference logs row counts
    * and durations per route (`api/logs/Tracker.py:33-54`) with separate
    * COUNT queries; at scale a second pass over the input is a second
    * 100 TB scan. `Observation` piggybacks the metrics on the job that
    * already runs: attach before the sink, read after the action
    * completes — zero extra jobs.
    */
  def observed(df: DataFrame, keyCol: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation()
    val tagged = df.observe(obs,
      count(lit(1)).as("n_rows"),
      count_if(col(keyCol).isNull).as("null_keys"))
    (tagged, obs)
  }
}
