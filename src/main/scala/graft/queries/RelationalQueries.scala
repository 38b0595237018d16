package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{Convo, Upsert}

/** The relational slice of SURVEY.md §2 (projections/filters P1–P12, joins
  * J1–J4/J9–J11, aggregations A1–A8, windows/sorts W1–W5, merge K4),
  * re-expressed over the driver's test tables with exact DuckDB oracles.
  *
  * Determinism rules used throughout: money/qty aggregates go through
  * DECIMAL (exact, engine-portable); every query ends with a total ORDER BY;
  * timestamps are compared at microsecond precision (Spark's native unit,
  * DuckDB's after CAST(ts AS TIMESTAMP)).
  */
object RelationalQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // A1/A6-style workhorse agg (TPC-H Q1 shape) — the reference's
    // `SUM … GROUP BY model` generalized (ExtractionLogger.py:72-83).
    QueryDef("q1_agg", (s, dir) => {
      t("lineitem")(s, dir)
        .where(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // Sum in DECIMAL (order-independent, engine-exact), then cast the
          // final value to DOUBLE: the driver's pandas bridge renders DECIMAL
          // with trailing zeros on one side only, while a correctly-rounded
          // decimal->double is the same float64 bit pattern in both engines.
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // P1 — projection with explicit column list (extraction_helpers.py:95-97).
    QueryDef("p1_projection", (s, dir) => {
      t("orders")(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus FROM orders ORDER BY o_orderkey""")),

    // P2 — half-open time-window range predicate (the 6h batch window shape).
    QueryDef("p2_time_window", (s, dir) => {
      t("events")(s, dir)
        .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
               col("ts") <  lit("2024-01-17 00:00:00").cast("timestamp"))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id, event_type FROM events
      WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
        AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-17 00:00:00'
      ORDER BY event_id""")),

    // P3+P4 — conjunctive predicate + DISTINCT (extraction_helpers.py:98-111).
    QueryDef("p4_distinct_filter", (s, dir) => {
      t("events")(s, dir)
        .where(col("event_type") === "purchase" &&
               col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
               col("ts") <  lit("2024-01-20 00:00:00").cast("timestamp"))
        .select(col("user_id")).distinct()
        .orderBy(col("user_id"))
    }, Some("""
      SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase'
        AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-05 00:00:00'
        AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-20 00:00:00'
      ORDER BY user_id""")),

    // P5 — IN-list over a CAST key + NOT NULL (TicketMessageProcessor.py:68-74).
    QueryDef("p5_inlist_cast", (s, dir) => {
      t("customer")(s, dir)
        .where(col("c_custkey").cast("string").isin("1", "2", "42", "100", "999", "1234") &&
               col("c_custkey").isNotNull)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE CAST(c_custkey AS VARCHAR) IN ('1','2','42','100','999','1234')
        AND c_custkey IS NOT NULL
      ORDER BY c_custkey""")),

    // P9/P10 — tolerant / name-pattern column drop (Extractor.py:293-298):
    // drop every column whose name contains "date".
    QueryDef("p10_drop_name_pattern", (s, dir) => {
      val df = t("orders")(s, dir)
      df.drop(df.columns.filter(_.toLowerCase.contains("date")): _*)
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders ORDER BY o_orderkey""")),

    // J1 — broadcast lookup join (agent-name enrichment shape).
    QueryDef("j1_lookup_join", (s, dir) => {
      val li = t("lineitem")(s, dir)
      val su = t("supplier")(s, dir)
      li.join(broadcast(su), col("l_suppkey") === col("s_suppkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("s_name"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_suppkey, s_name
      FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
      ORDER BY l_orderkey, l_linenumber""")),

    // J2 + F15 — lookup join with name→fallback coalesce
    // (TicketMessageProcessor.py:196-205).
    QueryDef("j2_name_coalesce", (s, dir) => {
      val cu = t("customer")(s, dir)
      val na = t("nation")(s, dir)
      cu.join(broadcast(na), col("c_nationkey") === col("n_nationkey"), "left")
        .select(col("c_custkey"),
          coalesce(nullif(trim(col("n_name")), lit("")), col("c_name"),
            lit("Unknown Name")).as("resolved_name"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey,
             coalesce(nullif(trim(n_name), ''), c_name, 'Unknown Name') AS resolved_name
      FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
      ORDER BY c_custkey""")),

    // J4 — conditional role-resolution CASE over join results
    // (TicketMessageProcessor.py:207-260: magic ids + membership checks).
    QueryDef("j4_role_case", (s, dir) => {
      val ev = t("events")(s, dir)
      val cu = t("customer")(s, dir).select(col("c_custkey"))
      ev.join(broadcast(cu), col("user_id") === col("c_custkey"), "left")
        .select(col("event_id"), col("user_id"),
          when(col("user_id") === 0, lit("system"))
            .when(col("event_type") === "signup" && col("c_custkey").isNotNull, lit("client"))
            .when(col("c_custkey").isNotNull, lit("agent"))
            .otherwise(lit("unknown")).as("sender_type"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id,
             CASE WHEN user_id = 0 THEN 'system'
                  WHEN event_type = 'signup' AND c_custkey IS NOT NULL THEN 'client'
                  WHEN c_custkey IS NOT NULL THEN 'agent'
                  ELSE 'unknown' END AS sender_type
      FROM events LEFT JOIN customer ON user_id = c_custkey
      ORDER BY event_id""")),

    // J9 — anti-join: new keys = run keys − existing keys
    // (ExtractionLogger.py:102-108). "Existing" = customers with a
    // positive balance, so both sides of the difference are non-trivial.
    QueryDef("j9_anti_join", (s, dir) => {
      val ev = t("events")(s, dir).select(col("user_id")).distinct()
      val cu = t("customer")(s, dir).where(col("c_acctbal") > 2000)
        .select(col("c_custkey"))
      ev.join(cu, col("user_id") === col("c_custkey"), "left_anti")
        .orderBy(col("user_id"))
    }, Some("""
      SELECT DISTINCT user_id FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey = e.user_id AND c.c_acctbal > 2000)
      ORDER BY user_id""")),

    // J10 — semi-join: updated keys = run keys ∩ existing keys.
    QueryDef("j10_semi_join", (s, dir) => {
      val or = t("orders")(s, dir).select(col("o_custkey")).distinct()
      val cu = t("customer")(s, dir).where(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
      or.join(cu, col("o_custkey") === col("c_custkey"), "left_semi")
        .orderBy(col("o_custkey"))
    }, Some("""
      SELECT DISTINCT o_custkey FROM orders o
      WHERE EXISTS (SELECT 1 FROM customer c
                    WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)
      ORDER BY o_custkey""")),

    // A2 — DISTINCT dedup over a projection.
    QueryDef("a2_distinct", (s, dir) => {
      t("orders")(s, dir)
        .select(col("o_custkey"), col("o_orderstatus")).distinct()
        .orderBy(col("o_custkey"), col("o_orderstatus"))
    }, Some("""
      SELECT DISTINCT o_custkey, o_orderstatus FROM orders ORDER BY 1, 2""")),

    // A3 — count.
    QueryDef("a3_count", (s, dir) => {
      t("lineitem")(s, dir).agg(count(lit(1)).as("n_rows"))
    }, Some("SELECT count(*) AS n_rows FROM lineitem")),

    // A4/W5 — per-group top-1 (argmax) with deterministic tie-break
    // (Geocode.py:74-77 best-candidate shape).
    QueryDef("a4_argmax", (s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").desc)
      t("customer")(s, dir)
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("c_nationkey"), col("c_custkey").as("best_custkey"),
          col("c_acctbal").as("best_acctbal"))
        .orderBy(col("c_nationkey"))
    }, Some("""
      SELECT c_nationkey, c_custkey AS best_custkey,
             c_acctbal AS best_acctbal
      FROM customer
      QUALIFY row_number() OVER (PARTITION BY c_nationkey
                                 ORDER BY c_acctbal DESC, c_custkey DESC) = 1
      ORDER BY c_nationkey""")),

    // A6 — per-group sorted string aggregation (conversation reassembly,
    // ConvoDataExtract.py:189-203) — the canonical collect_list+array_sort.
    QueryDef("a6_convo_agg", (s, dir) => {
      val ev = t("events")(s, dir).withColumn("__rendered",
        concat(lit("type: "), col("event_type"), lit("\nvalue: "),
          col("value").cast("decimal(10,2)").cast("string")))
      Convo.sortedStringAgg(ev, "user_id", Seq(col("ts"), col("event_id")),
        col("__rendered"), "\n\n")
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id,
             string_agg('type: ' || event_type || e'\n' || 'value: ' ||
                        CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR),
                        e'\n\n' ORDER BY CAST(ts AS TIMESTAMP), event_id) AS convo
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // A7 — union-all accumulate (page-result concat shape).
    QueryDef("a7_union_all", (s, dir) => {
      val ev = t("events")(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id"), col("event_type"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("event_type"))
      clicks.unionByName(errors).orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, event_type FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, event_type FROM events WHERE event_type = 'error'
      ORDER BY event_id""")),

    // A8 — set difference over key frames (metrics new-keys shape):
    // customers minus customers with a high-value order (non-empty both ways).
    QueryDef("a8_set_except", (s, dir) => {
      t("customer")(s, dir).select(col("c_custkey"))
        .except(t("orders")(s, dir).where(col("o_totalprice") > 300000)
          .select(col("o_custkey")))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey FROM customer
      EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000
      ORDER BY c_custkey""")),

    // S10 — SQL scan: arbitrary SQL over catalog tables (the BigQuery SQL
    // passthrough analog, BigQueryManager.py:116-123) — spark.sql over
    // registered views, exercising the SQL front end end-to-end.
    QueryDef("s10_sql_scan", (s, dir) => {
      t("orders")(s, dir).createOrReplaceTempView("orders_v")
      t("customer")(s, dir).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        WHERE o_orderstatus <> 'F'
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }, Some("""
      SELECT c_mktsegment, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderstatus <> 'F'
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Q3-shaped multi-join analytics: 3-way join + grouped decimal agg —
    // the plan Catalyst should broadcast (nation/customer) and shuffle once.
    QueryDef("q3_join_agg", (s, dir) => {
      val li = t("lineitem")(s, dir)
      val or = t("orders")(s, dir)
      val cu = t("customer")(s, dir)
      val na = t("nation")(s, dir)
      li.join(or, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .join(broadcast(na), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lineitems"))
        .orderBy(col("n_name"))
    }, Some("""
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_lineitems
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""")),

    // W4 — ORDER BY + LIMIT (table-fetch route shape), deterministic ties.
    QueryDef("w4_sort_limit", (s, dir) => {
      t("orders")(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey, o_totalprice
      FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)
      ORDER BY o_orderkey""")),

    // K4 — staged MERGE upsert as a join rewrite (extractor_bq_helpers.py:
    // 40-185), including the update-list asymmetry: o_orderpriority is
    // inserted for new keys but NOT updated on match.
    QueryDef("k4_merge_upsert", (s, dir) => {
      val or = t("orders")(s, dir)
      val target = or.where(col("o_orderkey") % 4 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
      val staging = or.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + lit(10.0)).as("o_totalprice"),
          col("o_orderpriority"))
      Upsert.merge(target, staging, "o_orderkey",
          updateCols = Seq("o_orderstatus", "o_totalprice"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      WITH target AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 4 <> 0),
      staging AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               o_totalprice + CAST(10 AS DOUBLE) AS o_totalprice,
               o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0)
      SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
             CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
             CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
             CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderpriority ELSE s.o_orderpriority END AS o_orderpriority
      FROM target t FULL OUTER JOIN staging s ON t.o_orderkey = s.o_orderkey
      ORDER BY o_orderkey""")),

    // Q5-shaped 6-way join: region→nation→customer→orders→lineitem→supplier
    // with the local-supplier condition — exercises Catalyst join ordering
    // and dimension broadcasting end-to-end.
    QueryDef("q5_region_revenue", (s, dir) => {
      val re = t("region")(s, dir)
      val na = t("nation")(s, dir)
      val cu = t("customer")(s, dir)
      val or = t("orders")(s, dir)
      val li = t("lineitem")(s, dir)
      val su = t("supplier")(s, dir)
      li.join(or, col("l_orderkey") === col("o_orderkey"))
        .join(cu, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
        .where(col("r_name").isin("ASIA", "EUROPE"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }, Some("""
      SELECT r_name, n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA', 'EUROPE')
      GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // A1 — grouped SUM, the metrics token-total shape.
    QueryDef("a1_grouped_sum", (s, dir) => {
      t("events")(s, dir)
        .groupBy(col("event_type"))
        .agg(sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
             count(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // S6 — nested message-group flatten: per-parent array<struct> exploded
    // to wide rows, parents with NO messages kept as a base row
    // (Ticket.py:143-186, explode_outer at :182-183). The array is built
    // in-query (orders × their high-linenumber lineitems) so the oracle can
    // replicate it; sorted for cross-engine determinism.
    QueryDef("s6_flatten_outer", (s, dir) => {
      val li = t("lineitem")(s, dir).where(col("l_linenumber") >= 5)
        .select(col("l_orderkey"),
          struct(col("l_linenumber").as("ln"), col("l_quantity").as("qty")).as("m"))
      val grouped = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("m"))).as("msgs"))
      val or = t("orders")(s, dir).where(col("o_orderkey") < 5000)
        .select(col("o_orderkey"))
      or.join(grouped, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), explode_outer(col("msgs")).as("m"))
        .select(col("o_orderkey"), col("m.ln").as("ln"), col("m.qty").as("qty"))
        .orderBy(col("o_orderkey"), col("ln"), col("qty"))
    }, Some("""
      WITH li AS (SELECT l_orderkey, l_linenumber AS ln, l_quantity AS qty
                  FROM lineitem WHERE l_linenumber >= 5),
      g AS (SELECT l_orderkey, list_sort(list(struct_pack(ln := ln, qty := qty))) AS msgs
            FROM li GROUP BY l_orderkey),
      o AS (SELECT o_orderkey FROM orders WHERE o_orderkey < 5000),
      j AS (SELECT o.o_orderkey,
                   CASE WHEN g.msgs IS NULL OR len(g.msgs) = 0 THEN [NULL] ELSE g.msgs END AS msgs
            FROM o LEFT JOIN g ON o.o_orderkey = g.l_orderkey),
      x AS (SELECT o_orderkey, unnest(msgs) AS m FROM j)
      SELECT o_orderkey, m.ln AS ln, m.qty AS qty FROM x
      ORDER BY o_orderkey, ln, qty""")),

    // J3 — ticket-metadata enrichment join with fallback values for misses
    // (Ticket.py:96-106: cache hit else passed-arg fallback).
    QueryDef("j3_metadata_join", (s, dir) => {
      val ev = t("events")(s, dir).select(col("event_id"), col("user_id"))
      val meta = t("customer")(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      ev.join(broadcast(meta), col("user_id") === col("c_custkey"), "left")
        .select(col("event_id"),
          coalesce(col("c_name"), concat(lit("user-"), col("user_id").cast("string")))
            .as("owner_name"),
          coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
             coalesce(c_name, 'user-' || CAST(user_id AS VARCHAR)) AS owner_name,
             coalesce(c_mktsegment, 'UNKNOWN') AS segment
      FROM events LEFT JOIN customer ON user_id = c_custkey
      ORDER BY event_id""")),

    // F13 — JSON field extraction (LLM output parse shape, LLMGateway.py:97-102).
    QueryDef("f13_json_extract", (s, dir) => {
      t("events")(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_value"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
      FROM events ORDER BY event_id"""))
  )
}
