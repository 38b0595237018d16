package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-6 temporal-pattern wave: seasonal-baseline anomaly flags (the
  * ops-monitoring shape) and session path mining (the first-k-events
  * sequence frequency table). Sums go through DECIMAL so no baseline can
  * move with partial-aggregation order; flags are cross-multiplied
  * decimal tests — no float boundary anywhere.
  */
object TemporalPatternQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Seasonal baseline + anomaly flag: the (type, hour-of-day) mean is
    // one map-side-combinable DECIMAL aggregate over the whole stream
    // broadcast back onto a filtered slice; a row is anomalous when
    // value > 3× its cell's mean, tested as value·n > 3·sum (exact
    // decimal cross-multiplication — the division never happens, so
    // the boundary is bit-stable). The baseline table is |types|×24
    // rows at ANY scale.
    QueryDef("anomaly_seasonal", (s, dir) => {
      val ev = t("events")(s, dir)
        .withColumn("hod", hour(col("ts")))
        .withColumn("v", col("value").cast("decimal(18,6)"))
      val base = ev.groupBy(col("event_type"), col("hod"))
        .agg(sum(col("v")).as("vsum"), count(lit(1)).as("vn"))
      ev.where(col("event_id") < 1000)
        .join(broadcast(base), Seq("event_type", "hod"))
        .select(col("event_id"), col("event_type"), col("hod"),
          (col("v") * col("vn") > col("vsum") * 3).as("is_anomaly"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH ev AS (
        SELECT event_id, event_type, CAST(hour(ts) AS INT) AS hod,
               CAST(value AS DECIMAL(18,6)) AS v
        FROM events),
      base AS (
        SELECT event_type, hod, sum(v) AS vsum,
               CAST(count(*) AS BIGINT) AS vn
        FROM ev GROUP BY 1, 2)
      SELECT e.event_id, e.event_type, e.hod,
             (e.v * b.vn > b.vsum * 3) AS is_anomaly
      FROM ev e JOIN base b USING (event_type, hod)
      WHERE e.event_id < 1000
      ORDER BY e.event_id""")),

    // Session path mining: each user's FIRST THREE event types joined
    // into a path string, then path frequencies — the sequence-pattern
    // table behind funnel design. The per-user window is key-partitioned
    // (one hash shuffle); the path table is at most |types|³ rows. Ties
    // at the same timestamp break on event_id, so the path is unique.
    QueryDef("session_paths", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t("events")(s, dir)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= 3)
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(array_sort(collect_list(
            struct(col("__rn"), col("event_type")))),
            e => e.getField("event_type")), ">").as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
    }, Some("""
      WITH r AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events QUALIFY rn <= 3),
      p AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r GROUP BY user_id)
      SELECT path, CAST(count(*) AS BIGINT) AS n_users
      FROM p GROUP BY path
      ORDER BY n_users DESC, path""")),

    // Retractable incremental aggregation (the Z-set / DBSP algebra):
    // the standing per-(flag, status) aggregate absorbs a delta batch
    // carrying BOTH inserts (w=+1, shipdate ≥ cutoff) and retractions
    // (w=−1, standing rows whose orderkey % 17 = 0) as weighted sums —
    // deletions maintain incrementally, which plain additive deltas
    // cannot do. Fully-retracted keys drop out. The oracle computes the
    // plain aggregate over (standing ∖ retracted) ∪ inserted — matching
    // hashes prove the retraction law. DECIMAL sums keep the weighted
    // arithmetic exact. Scale: the refresh shuffles only the delta's
    // partial + one key-to-key outer join — history is never rescanned,
    // even for deletes.
    QueryDef("incremental_agg_retract", (s, dir) => {
      import graft.operators.IncrementalAgg
      val cutoff = lit("2000-01-01 00:00:00").cast("timestamp_ntz")
      val li = t("lineitem")(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_orderkey"), col("l_shipdate"),
          col("l_quantity").cast("decimal(18,2)").as("qty"))
      val base = li.where(col("l_shipdate") < cutoff)
      val standing = base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("qty"))
      val inserts = li.where(col("l_shipdate") >= cutoff)
        .withColumn("w", lit(1L))
      val retractions = base.where(col("l_orderkey") % 17 === 0)
        .withColumn("w", lit(-1L))
      val deltaPart = IncrementalAgg.weightedPartial(
        inserts.unionByName(retractions),
        Seq("l_returnflag", "l_linestatus"), "w", Seq("qty"))
      val merged = IncrementalAgg.applyDelta(standing, deltaPart,
        Seq("l_returnflag", "l_linestatus"),
        Map("n" -> IncrementalAgg.Add, "qty" -> IncrementalAgg.Add))
      IncrementalAgg.dropDeadKeys(merged)
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          col("qty").cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some("""
      WITH li AS (
        SELECT l_returnflag, l_linestatus, l_orderkey, l_shipdate,
               CAST(l_quantity AS DECIMAL(18,2)) AS qty
        FROM lineitem),
      final AS (
        SELECT * FROM li
        WHERE (l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
                 AND l_orderkey % 17 <> 0)
           OR l_shipdate >= TIMESTAMP '2000-01-01 00:00:00')
      SELECT l_returnflag, l_linestatus,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(qty) AS DOUBLE) AS sum_qty
      FROM final GROUP BY 1, 2 HAVING count(*) > 0
      ORDER BY 1, 2""")),

    // GDPR cascade audit: given a victim user/customer set, the
    // per-table blast radius of a right-to-be-forgotten request —
    // orders by direct key, lineitems through the order cascade, events
    // by user key. Every membership test is a broadcast semi-join
    // against the (small) victim set; the fact tables are scanned once
    // each and never shuffled — the shape that makes deletion sweeps
    // feasible on 100 TB. Counts are exact; the audit runs BEFORE the
    // deletes as the compliance evidence.
    QueryDef("gdpr_cascade_audit", (s, dir) => {
      val victims = t("customer")(s, dir)
        .where(col("c_custkey") % 97 === 0)
        .select(col("c_custkey")).cache()
      val orders = t("orders")(s, dir)
      val affOrders = orders.join(broadcast(victims),
        col("o_custkey") === col("c_custkey"), "left_semi").cache()
      val li = t("lineitem")(s, dir)
      val affLi = li.join(
        broadcast(affOrders.select(col("o_orderkey"))),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      val ev = t("events")(s, dir)
      val affEv = ev.where(col("user_id") % 97 === 0)
      def row(name: String, total: org.apache.spark.sql.DataFrame,
              affected: org.apache.spark.sql.DataFrame) =
        total.agg(count(lit(1)).as("rows_total"))
          .crossJoin(affected.agg(count(lit(1)).as("rows_affected")))
          .select(lit(name).as("table"), col("rows_total"),
            col("rows_affected"))
      row("customer", t("customer")(s, dir), victims)
        .unionByName(row("orders", orders, affOrders))
        .unionByName(row("lineitem", li, affLi))
        .unionByName(row("events", ev, affEv))
        .orderBy(col("table"))
    }, Some("""
      WITH v AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      ao AS (SELECT o_orderkey FROM orders
             WHERE o_custkey IN (SELECT c_custkey FROM v))
      SELECT * FROM (
        SELECT 'customer' AS "table",
               (SELECT CAST(count(*) AS BIGINT) FROM customer) AS rows_total,
               (SELECT CAST(count(*) AS BIGINT) FROM v) AS rows_affected
        UNION ALL
        SELECT 'orders',
               (SELECT CAST(count(*) AS BIGINT) FROM orders),
               (SELECT CAST(count(*) AS BIGINT) FROM ao)
        UNION ALL
        SELECT 'lineitem',
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem
                WHERE l_orderkey IN (SELECT o_orderkey FROM ao))
        UNION ALL
        SELECT 'events',
               (SELECT CAST(count(*) AS BIGINT) FROM events),
               (SELECT CAST(count(*) AS BIGINT) FROM events
                WHERE user_id % 97 = 0))
      ORDER BY "table""""))
  )
}
