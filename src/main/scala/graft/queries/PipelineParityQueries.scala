package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.MessageEnrich

/** Lifecycle-shaped correctness entries: the message sender/receiver
  * enrichment (the reference's `TicketMessageProcessor` semantics, J4+J2)
  * run as a pure frame → frame operator over the synthetic tables, with a
  * DuckDB oracle replicating the RULES (joins + CASE chain), not the
  * implementation.
  */
object PipelineParityQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // The full sender/receiver CASE (TicketMessageProcessor.py:207-291)
    // over a synthetic message batch: events rows play flattened messages
    // (author = user_id, ticket agent = user_id+3, owner name derived,
    // NULL every 7th), every-5th customer plays the agents dimension.
    // Magic ids chosen so the special id ('55') is ALSO an agent —
    // exercising the reference's precedence (magic ids first).
    QueryDef("lifecycle_msg_enrich", (s, dir) => {
      val flat = t("events")(s, dir).select(
        col("event_id"),
        col("user_id").cast("string").as("userid"),
        ((col("user_id") + 3) % 1500).cast("string").as("agentid"),
        when(col("event_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("owner-"), (col("event_id") % 50).cast("string")))
          .as("owner_name"))
      val agents = t("customer")(s, dir).where(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").cast("string").as("id"), col("c_name").as("name"))
      MessageEnrich.enrich(flat, agents,
          MessageEnrich.Ids(systemUserId = "42", specialUserId = "55",
            brandName = "BrandCo"))
        .select(col("event_id"), col("sender_name"), col("sender_type"),
          col("receiver_name"), col("receiver_type"), col("agent_name"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH flat AS (
        SELECT event_id,
               CAST(user_id AS VARCHAR) AS userid,
               CAST((user_id + 3) % 1500 AS VARCHAR) AS agentid,
               CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE 'owner-' || CAST(event_id % 50 AS VARCHAR) END AS owner_name
        FROM events),
      agents AS (
        SELECT CAST(c_custkey AS VARCHAR) AS id, c_name AS name
        FROM customer WHERE c_custkey % 5 = 0),
      j AS (
        SELECT f.*, ma.id AS ma_id, ma.name AS ma_name,
               ta.id AS ta_id, ta.name AS ta_name
        FROM flat f
        LEFT JOIN agents ma ON f.userid = ma.id
        LEFT JOIN agents ta ON f.agentid = ta.id)
      SELECT event_id,
        CASE WHEN userid = '42' THEN 'System'
             WHEN userid = '55' THEN 'BrandCo'
             WHEN ma_id IS NOT NULL THEN coalesce(ma_name, 'Unknown Agent')
             ELSE coalesce(owner_name, 'Unknown User') END AS sender_name,
        CASE WHEN userid IN ('42', '55') THEN 'system'
             WHEN ma_id IS NOT NULL THEN 'agent'
             ELSE 'client' END AS sender_type,
        CASE WHEN userid IN ('42', '55') OR ma_id IS NOT NULL
               THEN coalesce(owner_name, 'Unknown User')
             ELSE CASE WHEN ta_id IS NOT NULL
                         THEN CASE WHEN ta_id = '55' THEN 'BrandCo'
                                   ELSE coalesce(ta_name, 'Unknown Agent') END
                       ELSE 'Unknown Agent' END END AS receiver_name,
        CASE WHEN userid IN ('42', '55') OR ma_id IS NOT NULL THEN 'client'
             ELSE 'agent' END AS receiver_type,
        CASE WHEN ta_id IS NOT NULL THEN coalesce(ta_name, 'Unknown Agent')
             ELSE 'Unknown Agent' END AS agent_name
      FROM j ORDER BY event_id"""))
  )
}
