package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, TimeFns}
import graft.llm.{LlmExtract, LlmGateway}
import graft.operators.{Convo, GeocodeJoin, Warehouse}
import graft.sources.{LiveAgentApi, LiveAgentSource}

/** The three §3 lifecycles as composable jobs over a Warehouse, plus the
  * metrics job — the engine-side equivalents of the reference's FastAPI
  * routes (SURVEY.md §3.1–§3.3; `api/app.py:45-55` ordering:
  * agents → tags → tickets → convo).
  */
final class Pipelines(spark: SparkSession, wh: Warehouse, api: LiveAgentApi,
                      llm: LlmGateway) {

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
    wh.upsert("tickets", t, "id", updateCols)
    t.count()
  }

  /** Messages leg: flatten groups (S6), enrich sender/receiver via the
    * agents dimension (J1/J4), extract reference codes (F1), append
    * (append-only — duplicates on rerun preserved for parity, §2.8).
    */
  def processMessages(groups: DataFrame): Long = {
    val flat = LiveAgentSource.flattenMessageGroups(groups)
    val agents = if (wh.exists("agents")) wh.read("agents") else null
    val enriched =
      if (agents != null && agents.columns.contains("id") && flat.columns.contains("message_userid"))
        flat.join(broadcast(agents.select(col("id").as("__aid"),
            col("name").as("agent_name"))),
          col("message_userid") === col("__aid"), "left").drop("__aid")
          .withColumn("agent_name",
            coalesce(col("agent_name"), lit("Unknown Agent")))
      else flat
    val coded =
      if (enriched.columns.contains("message"))
        enriched.withColumn("reference_code",
          TextFns.extractReferenceCode(col("message")))
      else enriched
    wh.append("messages", coded)
    coded.count()
  }

  /** §3.2 — convo analysis: reassemble conversations (A6) → LLM extraction
    * (X1, injected gateway) → geocode-style match + serviceability tag
    * (J5–J8) → history append + upsert (K5+K4). Geocode results join back
    * on the key — the reference's positional concat (J12) is intentionally
    * replaced by a key join (SURVEY.md §7.3).
    */
  def processConvos(messages: DataFrame, refTable: DataFrame, refNameCol: String,
                    serviceable: DataFrame, svcNameCol: String,
                    updateCols: Seq[String]): Long = {
    val convos = Convo.conversationText(messages)
    val analysis = LlmExtract.extract(
      convos.select(col("ticket_id").cast("string").as("ticket_id"), col("convo")),
      "ticket_id", "convo", llm)
    val geo = GeocodeJoin.bestMatch(
        analysis.where(col("location") =!= "").select(col("ticket_id"), col("location")),
        refTable, "location", refNameCol, "ticket_id")
      .select(col("ticket_id"), col(refNameCol).as("matched_location"),
        col("score"), col("accepted"))
    val tagged = GeocodeJoin.tagViable(
      analysis.join(geo, Seq("ticket_id"), "left"),
      serviceable, "location", svcNameCol)
    wh.append("convo_analysis_history", tagged)
    wh.upsert("convo_analysis", tagged, "ticket_id", updateCols)
    tagged.count()
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
