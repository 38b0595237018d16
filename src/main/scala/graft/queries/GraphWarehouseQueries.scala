package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Cdc, PageRank, Scd2}

/** Round-4 warehouse/graph wave: incremental SCD2 maintenance and
  * fixed-iteration integer PageRank — both exact (interval bounds are
  * timestamps; ranks are scaled BIGINTs), so the DuckDB oracle
  * hash-matches with no tolerance.
  */
object GraphWarehouseQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Incremental SCD2 apply, verified through the law
    // apply(fromLog(log ≤ D), log > D) ≡ fromLog(log): the Spark side
    // builds the standing table at a cutoff and folds the newer changes
    // in; the ORACLE builds the one-shot interval table over the full
    // log — if the incremental path diverges anywhere, the hash breaks.
    QueryDef("scd2_apply", (s, dir) => {
      val wDedup = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val log = t("events")(s, dir)
        .select(col("user_id"), col("ts"), col("event_type").as("state"),
          col("event_id"))
        .withColumn("__rn", row_number().over(wDedup)).where(col("__rn") === 1)
        .drop("__rn", "event_id")
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val existing = Scd2.fromLog(log.where(col("ts") <= cutoff),
        "user_id", "ts", Seq("state"))
      val delta = log.where(col("ts") > cutoff)
      Scd2.applyChanges(existing, delta, "user_id", "ts", Seq("state"))
        .orderBy(col("user_id"), col("valid_from"))
    }, Some("""
      WITH d AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type AS state
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1)
      SELECT user_id, ts AS valid_from, state,
             lead(ts) OVER w AS valid_to,
             lead(ts) OVER w IS NULL AS is_current
      FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      ORDER BY user_id, valid_from""")),

    // Point-in-time snapshot of the SCD2 interval table: the one row per
    // key valid at the cutoff. The snapshot itself is a narrow filter
    // over the interval table (pushes to the scan; prunes on a
    // valid_from-partitioned layout) — the query pins the filter
    // semantics, open intervals included, against the one-shot oracle.
    QueryDef("scd2_snapshot", (s, dir) => {
      val wDedup = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val log = t("events")(s, dir)
        .select(col("user_id"), col("ts"), col("event_type").as("state"),
          col("event_id"))
        .withColumn("__rn", row_number().over(wDedup)).where(col("__rn") === 1)
        .drop("__rn", "event_id")
      val asOf = lit("2024-01-20 00:00:00").cast("timestamp")
      Scd2.snapshotAt(Scd2.fromLog(log, "user_id", "ts", Seq("state")), asOf)
        .orderBy(col("user_id"))
    }, Some("""
      WITH d AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type AS state
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1),
      iv AS (
        SELECT user_id, ts AS valid_from, state,
               lead(ts) OVER w AS valid_to,
               lead(ts) OVER w IS NULL AS is_current
        FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts))
      SELECT * FROM iv
      WHERE valid_from <= TIMESTAMP '2024-01-20 00:00:00'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-20 00:00:00')
      ORDER BY user_id""")),

    // CDC ops-log compaction: a deterministic I/U/D stream derived from
    // orders (op keyed off o_orderkey so both engines derive the same
    // log), reduced to final state with latest-op-wins + delete
    // semantics. The Spark side is a map-side-combinable max(struct)
    // aggregation (operators.Cdc) — the oracle takes the window-argmax
    // route; matching hashes prove the aggregation ≡ window compaction.
    QueryDef("cdc_apply", (s, dir) => {
      val m = col("o_orderkey") % 10
      val ops = t("orders")(s, dir).select(
        col("o_custkey").as("k"), col("o_orderkey").as("seq"),
        when(m === 0, lit("D")).when(m <= 3, lit("U")).otherwise(lit("I"))
          .as("op"),
        col("o_orderstatus"), col("o_totalprice"))
      Cdc.applyLatest(ops, "k", "seq", "op",
          Seq("o_orderstatus", "o_totalprice"))
        .orderBy(col("k"))
    }, Some("""
      WITH ops AS (
        SELECT o_custkey AS k, o_orderkey AS seq,
               CASE WHEN o_orderkey % 10 = 0 THEN 'D'
                    WHEN o_orderkey % 10 <= 3 THEN 'U'
                    ELSE 'I' END AS op,
               o_orderstatus, o_totalprice
        FROM orders),
      last AS (
        SELECT * FROM ops
        QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1)
      SELECT k, seq, op, o_orderstatus, o_totalprice
      FROM last WHERE op <> 'D' ORDER BY k""")),

    // Integer PageRank (3 iterations, d = 85/100) over the undirected
    // customer↔supplier co-purchase graph (suppliers offset into their
    // own id space). Scaled-BIGINT ranks make every iteration
    // bit-identical across engines; the oracle unrolls the same three
    // steps as chained CTEs.
    QueryDef("graph_pagerank", (s, dir) => {
      // the bipartite pair set is a FrontCache-pinned per-corpus front
      // (the round-10 profile put this build at the query's cost floor)
      val pairs = CorpusFronts.custSuppPairs(s, dir)
      val edges = pairs.select(col("c").as("src"), col("sn").as("dst"))
        .unionByName(pairs.select(col("sn").as("src"), col("c").as("dst")))
      PageRank.ranks(edges, "src", "dst", iters = 3)
        .orderBy(col("node"))
    }, Some {
      def iter(prev: String, cur: String): String = s"""
      $cur AS (
        SELECT n2.node,
               ((15 * (1000000000000 // t.nn)) // 100) +
               ((85 * COALESCE(s.contrib, 0)) // 100) AS rank
        FROM nodes n2 CROSS JOIN n t
        LEFT JOIN (
          SELECT e.dst AS node, CAST(sum(r.rank // o.deg) AS BIGINT) AS contrib
          FROM $prev r JOIN edges e ON e.src = r.node
          JOIN outdeg o ON o.src = e.src
          GROUP BY e.dst) s ON s.node = n2.node)"""
      s"""
      WITH pairs AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS sn
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (
        SELECT c AS src, sn AS dst FROM pairs
        UNION ALL SELECT sn AS src, c AS dst FROM pairs),
      nodes AS (SELECT DISTINCT src AS node FROM edges),
      n AS (SELECT count(*) AS nn FROM nodes),
      outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      r0 AS (SELECT node, 1000000000000 // t.nn AS rank
             FROM nodes CROSS JOIN n t),
      ${iter("r0", "r1")},
      ${iter("r1", "r2")},
      ${iter("r2", "r3")}
      SELECT node, rank FROM r3 ORDER BY node"""
    })
  )
}
