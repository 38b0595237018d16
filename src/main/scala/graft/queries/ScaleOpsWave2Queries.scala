package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{IncrementalAgg, Skew}

/** Round-6 scale-ops wave 2: the skew-mitigation and incremental-
  * maintenance operators get correctness-gate coverage. Each query's
  * oracle is the PLAIN relational form — the whole point of these
  * rewrites is result-identity under a different (skew/delta-robust)
  * physical shape, so "salted ≡ plain" / "incremental ≡ recompute" is
  * exactly the property the gate should pin.
  */
object ScaleOpsWave2Queries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Two-phase salted aggregation (Skew.saltedAggregate): partial agg on
    // (key, salt) spreads a hot key across 16 reducers, final agg merges
    // the partials. Decimal sums keep both phases associative-exact, so
    // the result is bit-identical to the one-phase GROUP BY the oracle
    // runs. At 100 TB this is the fallback when ONE key dominates a
    // groupBy and even map-side combine leaves a single hot reducer.
    QueryDef("skew_salted_agg", (s, dir) => {
      Skew.saltedAggregate(t("events")(s, dir), Seq("event_type"), 16)(
          partial = Seq(
            count(lit(1)).as("__n"),
            sum(col("value").cast("decimal(12,2)")).as("__sv")),
          fin = Seq(
            sum(col("__n")).as("n_events"),
            sum(col("__sv")).cast("double").as("total_value")))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // Salted equi-join (Skew.saltedJoin): fact rows get a deterministic
    // salt, the non-broadcastable dim is replicated saltFactor ways, and
    // the join key widens to (key, salt) — a hot part key spreads over 8
    // reducers instead of stalling one. Result ≡ the plain join; the
    // oracle runs the plain join. (When the dim DOES fit in memory,
    // broadcast beats salting — this is the middle regime: dim too big
    // to broadcast, fact skewed on the key.)
    QueryDef("skew_salted_join", (s, dir) => {
      val fact = t("lineitem")(s, dir)
        .select(col("l_partkey").as("partkey"),
          col("l_quantity").cast("decimal(12,2)").as("qty"))
      val dim = t("part")(s, dir)
        .select(col("p_partkey").as("partkey"), col("p_brand"))
      Skew.saltedJoin(fact, dim, "partkey", 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("qty")).cast("double").as("sum_qty"))
        .orderBy(col("p_brand"))
    }, Some("""
      SELECT p_brand, count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""")),

    // Incremental aggregate maintenance (IncrementalAgg.applyDelta): a
    // standing per-user aggregate (events with event_id % 4 <> 3) folded
    // with a delta batch's partial aggregate (the % 4 = 3 slice) — one
    // small hash agg over the delta plus one key-keyed outer join, never
    // a rescan of history. The oracle recomputes from scratch over ALL
    // events; merged ≡ recomputed is the materialized-view invariant.
    QueryDef("incremental_agg_merge", (s, dir) => {
      val ev = t("events")(s, dir)
        .select(col("event_id"), col("user_id"),
          col("value").cast("decimal(12,2)").as("v"))
      def aggOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("user_id")).agg(
          count(lit(1)).as("n_events"),
          sum(col("v")).as("total_value"),
          max(col("v")).as("max_value"))
      val standing = aggOf(ev.where(col("event_id") % 4 =!= 3))
      val delta    = aggOf(ev.where(col("event_id") % 4 === 3))
      IncrementalAgg.applyDelta(standing, delta, Seq("user_id"),
          Map("n_events" -> IncrementalAgg.Add,
              "total_value" -> IncrementalAgg.Add,
              "max_value" -> IncrementalAgg.Max))
        .select(col("user_id"), col("n_events").cast("long").as("n_events"),
          col("total_value").cast("double").as("total_value"),
          col("max_value").cast("double").as("max_value"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id, count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
             CAST(max(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS max_value
      FROM events GROUP BY user_id ORDER BY user_id"""))
  )
}
