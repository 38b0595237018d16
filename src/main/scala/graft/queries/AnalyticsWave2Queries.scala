package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-4 analytics wave 2: scale-shaped exact order statistics
  * (two-phase histogram percentiles + deterministic mode), the multiset
  * set-operation pair (EXCEPT ALL / INTERSECT ALL), and linear gap
  * interpolation over a densified daily series.
  */
object AnalyticsWave2Queries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Exact discrete percentiles + mode per group, two-phase: the fact
    // table collapses map-side into a (flag, qty) histogram (<= 3 x 50
    // rows), every window/argmax below runs on the tiny histogram — the
    // fact is never sorted or windowed (contrast text_token_quantiles,
    // which pins the `percentile` aggregate itself). Thresholds are
    // cross-multiplied BIGINT tests (cum*100 >= n*99 ⇔ cum >= 0.99n), so
    // no float appears anywhere. Mode ties break to the smallest qty via
    // min(struct(-cnt, qty)) — the oracle's window-argmax route must
    // agree bit-for-bit.
    QueryDef("stats_percentile_mode", (s, dir) => {
      val hist = t("lineitem")(s, dir)
        .select(col("l_returnflag"), col("l_quantity").cast("int").as("qty"))
        .groupBy(col("l_returnflag"), col("qty"))
        .agg(count(lit(1)).as("cnt"))
      val h2 = hist
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))))
        .withColumn("n", sum(col("cnt")).over(
          Window.partitionBy(col("l_returnflag"))))
      h2.groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") * 2 >= col("n"), col("qty"))).as("p50"),
          min(when(col("cum") * 10 >= col("n") * 9, col("qty"))).as("p90"),
          min(when(col("cum") * 100 >= col("n") * 99, col("qty"))).as("p99"),
          min(struct((-col("cnt")).as("negc"), col("qty")))
            .getField("qty").as("mode_qty"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      WITH hist AS (
        SELECT l_returnflag, CAST(l_quantity AS INT) AS qty,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1, 2),
      h2 AS (
        SELECT l_returnflag, qty, cnt,
               CAST(sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY qty)
                    AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, qty) AS rn
        FROM hist)
      SELECT l_returnflag, max(n) AS n,
             min(CASE WHEN cum * 2 >= n THEN qty END) AS p50,
             min(CASE WHEN cum * 10 >= n * 9 THEN qty END) AS p90,
             min(CASE WHEN cum * 100 >= n * 99 THEN qty END) AS p99,
             max(CASE WHEN rn = 1 THEN qty END) AS mode_qty
      FROM h2 GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // EXCEPT ALL — multiset difference (each occurrence cancels one
    // occurrence, unlike a8_set_except's distinct EXCEPT). Spark plans
    // this as a count-generate rewrite, not a join per duplicate.
    QueryDef("a16_except_all", (s, dir) => {
      val li = t("lineitem")(s, dir)
      li.where(col("l_returnflag") === "R").select(col("l_suppkey"))
        .exceptAll(li.where(col("l_returnflag") === "A").select(col("l_suppkey")))
        .orderBy(col("l_suppkey"))
    }, Some("""
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      ORDER BY l_suppkey""")),

    // INTERSECT ALL — multiset intersection (min of the two
    // multiplicities per value).
    QueryDef("a17_intersect_all", (s, dir) => {
      val li = t("lineitem")(s, dir)
      li.where(col("l_returnflag") === "R").select(col("l_suppkey"))
        .intersectAll(li.where(col("l_returnflag") === "A")
          .select(col("l_suppkey")))
        .orderBy(col("l_suppkey"))
    }, Some("""
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
      ORDER BY l_suppkey""")),

    // Linear interpolation over a densified per-user daily series:
    // max(value) per present day (max, not avg — order-independent over
    // doubles), missing interior days get prev + (next-prev) * frac with
    // the identical expression tree in both engines; leading/trailing
    // gaps stay NULL. Two ignore-nulls windows per direction, both
    // partitioned by user — no global window.
    QueryDef("fill_interpolate", (s, dir) => {
      val ev = t("events")(s, dir).withColumn("day", to_date(col("ts")))
      val daily = ev.groupBy(col("user_id"), col("day"))
        .agg(max(col("value")).as("v"))
      val days = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val dense = days.join(daily, Seq("user_id", "day"), "left")
      val wB = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val presentDay = when(col("v").isNotNull, col("day"))
      val interp = dense
        .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(wB))
        .withColumn("prev_d", last(presentDay, ignoreNulls = true).over(wB))
        .withColumn("next_v", first(col("v"), ignoreNulls = true).over(wF))
        .withColumn("next_d", first(presentDay, ignoreNulls = true).over(wF))
      interp.select(col("user_id"), col("day").cast("timestamp").as("day_ts"),
          col("v").as("v_raw"),
          when(col("v").isNotNull, col("v"))
            .when(col("prev_v").isNotNull && col("next_v").isNotNull,
              col("prev_v") + (col("next_v") - col("prev_v")) *
                (datediff(col("day"), col("prev_d")).cast("double") /
                  datediff(col("next_d"), col("prev_d")).cast("double")))
            .otherwise(lit(null).cast("double")).as("v_filled"))
        .orderBy(col("user_id"), col("day_ts"))
    }, Some("""
      WITH ev AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               value
        FROM events),
      daily AS (SELECT user_id, day, max(value) AS v FROM ev GROUP BY 1, 2),
      span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY 1),
      days AS (
        SELECT user_id,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM span),
      dense AS (
        SELECT days.user_id, days.day, daily.v
        FROM days LEFT JOIN daily
          ON days.user_id = daily.user_id AND days.day = daily.day),
      interp AS (
        SELECT user_id, day, v,
               last_value(v IGNORE NULLS) OVER wb AS prev_v,
               last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                 OVER wb AS prev_d,
               first_value(v IGNORE NULLS) OVER wf AS next_v,
               first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
                 OVER wf AS next_d
        FROM dense
        WINDOW
          wb AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, CAST(day AS TIMESTAMP) AS day_ts, v AS v_raw,
             CASE WHEN v IS NOT NULL THEN v
                  WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                    prev_v + (next_v - prev_v) *
                      (CAST(date_diff('day', prev_d, day) AS DOUBLE) /
                       CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
                  ELSE NULL END AS v_filled
      FROM interp ORDER BY user_id, day_ts"""))
  )
}
