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
      ORDER BY n_users DESC, path"""))
  )
}
