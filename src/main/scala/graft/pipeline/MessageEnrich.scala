package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The message sender/receiver enrichment semantics of the reference's
  * biggest module (`core/TicketMessageProcessor.py:196-291`), re-expressed
  * as one declarative pass: two broadcast joins against the agents
  * dimension (message author + ticket agent) and a when-chain for the
  * role-resolution CASE (J4). The reference walks a Python dict per
  * message; here the whole batch is one codegen'd projection.
  *
  * The two magic user ids are INJECTED ([[Ids]]): the reference hardcodes
  * an automated-sender id and an HTML-system id (`config/constants.py:8-9`)
  * whose messages are attributed to the brand / "System" rather than to an
  * agent or the client. Semantics preserved, values configurable.
  */
object MessageEnrich {

  /** The deployment-specific constants of the CASE chain. */
  final case class Ids(systemUserId: String, specialUserId: String,
                       brandName: String)

  /** J2 — user display-name resolution (`TicketMessageProcessor.py:196-205`):
    * non-blank name, else non-blank email, else the sentinel.
    */
  def resolvedUserName(name: Column, email: Column): Column =
    coalesce(nullif(trim(name), lit("")), nullif(trim(email), lit("")),
      lit("Unknown Name"))

  /** J4 — sender/receiver resolution over the flattened messages
    * (`TicketMessageProcessor.py:207-291`). Adds `sender_name`,
    * `sender_type`, `receiver_name`, `receiver_type`, `agent_name`.
    *
    * Column contract on `flat` (absent columns are treated as NULL):
    *   - `userid`       — the message author id (the CASE key; the
    *                      reference reads the group-level `userid`)
    *   - `agentid`      — the ticket's assigned agent id
    *   - `owner_name`   — the ticket owner (client) display name
    * `agents` carries (`id`, `name`).
    *
    * Precedence mirrors the reference exactly: magic ids first (even when
    * they also appear in the agents dimension), then agent-authored, else
    * client-authored with the ticket agent as receiver (the special id as
    * ticket agent renders as the brand name).
    */
  def enrich(flat: DataFrame, agents: DataFrame, ids: Ids): DataFrame = {
    require(!flat.columns.exists(_.startsWith("__ma_")) &&
      !flat.columns.exists(_.startsWith("__ta_")),
      "__ma_*/__ta_* are reserved working column names")
    val withCols = Seq("userid", "agentid", "owner_name").foldLeft(flat) {
      (df, c) => if (df.columns.contains(c)) df
                 else df.withColumn(c, lit(null).cast("string"))
    }
    // the reference's dict cache keeps ONE row per agent id
    // (`TicketMessageProcessor.py:53-57` — later rows overwrite); a
    // duplicate id here would instead fan out every joined message, so
    // collapse to one row per id before the joins
    val dim = agents.select(col("id").cast("string").as("id"), col("name"))
      .dropDuplicates("id")
    val joined = withCols
      .join(broadcast(dim.select(col("id").as("__ma_id"), col("name").as("__ma_name"))),
        col("userid").cast("string") === col("__ma_id"), "left")
      .join(broadcast(dim.select(col("id").as("__ta_id"), col("name").as("__ta_name"))),
        col("agentid").cast("string") === col("__ta_id"), "left")

    val owner = coalesce(col("owner_name"), lit("Unknown User"))
    val uid = col("userid").cast("string")
    val isSystem  = uid === ids.systemUserId
    val isSpecial = uid === ids.specialUserId
    val isAgent   = col("__ma_id").isNotNull
    // receiver when the client authored: the ticket agent's name, the
    // special id rendering as the brand (TicketMessageProcessor.py:244-252)
    val ticketAgentName =
      when(col("__ta_id").isNotNull,
        when(col("__ta_id") === ids.specialUserId, lit(ids.brandName))
          .otherwise(coalesce(col("__ta_name"), lit("Unknown Agent"))))
        .otherwise(lit("Unknown Agent"))

    joined
      .withColumn("sender_name",
        when(isSystem, lit("System"))
          .when(isSpecial, lit(ids.brandName))
          .when(isAgent, coalesce(col("__ma_name"), lit("Unknown Agent")))
          .otherwise(owner))
      .withColumn("sender_type",
        when(isSystem || isSpecial, lit("system"))
          .when(isAgent, lit("agent"))
          .otherwise(lit("client")))
      .withColumn("receiver_name",
        when(isSystem || isSpecial || isAgent, owner)
          .otherwise(ticketAgentName))
      .withColumn("receiver_type",
        when(isSystem || isSpecial || isAgent, lit("client"))
          .otherwise(lit("agent")))
      // plain ticket-agent attribution, no special-id rendering
      // (TicketMessageProcessor.py:282-283)
      .withColumn("agent_name",
        when(col("__ta_id").isNotNull,
          coalesce(col("__ta_name"), lit("Unknown Agent")))
          .otherwise(lit("Unknown Agent")))
      .drop("__ma_id", "__ma_name", "__ta_id", "__ta_name")
  }
}
