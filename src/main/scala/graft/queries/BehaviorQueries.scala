package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 behavioral-analytics breadth: NULL-handling scalar family,
  * windowed distinct counting (Spark lacks DISTINCT aggregates in window
  * frames — the dense_rank workaround is plan-identical to one window
  * shuffle), time-series densification (sparse → gap-filled daily series,
  * the standard feature-engineering precursor), funnel conversion, and
  * cohort retention. All integer/timestamp-exact; week truncation is
  * Monday-based in both engines.
  */
object BehaviorQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Audience overlap between event types: exact Jaccard of the user
    // sets of every type pair — the "are these two behaviors the same
    // people" matrix. Distinct (type, user) once, then a self-join on
    // user_id whose fan-out is bounded by C(|types|, 2) pairs PER USER —
    // never user × user; the pair table is |types|² rows.
    QueryDef("audience_overlap", (s, dir) => {
      val tu = t("events")(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
      val na = tu.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
      val inter = tu.alias("a").join(tu.alias("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_common"))
      inter
        .join(broadcast(na.select(col("event_type").as("type_a"),
          col("nu").as("n_a"))), Seq("type_a"))
        .join(broadcast(na.select(col("event_type").as("type_b"),
          col("nu").as("n_b"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          col("n_common"),
          (col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
            .as("jaccard"))
        .orderBy(col("type_a"), col("type_b"))
    }, Some("""
      WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu
             FROM tu GROUP BY 1),
      inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT i.type_a, i.type_b, x.nu AS n_a, y.nu AS n_b, i.n_common,
             CAST(i.n_common AS DOUBLE)
               / CAST(x.nu + y.nu - i.n_common AS DOUBLE) AS jaccard
      FROM inter i
      JOIN na x ON x.event_type = i.type_a
      JOIN na y ON y.event_type = i.type_b
      ORDER BY type_a, type_b""")),

    // Order-size histogram — the count-of-counts profile (how many
    // orders have k line items) plus each size's share of all lines:
    // the fact-table shape diagnostic behind join-size estimates and
    // pack sizing. Two grouped counts; shares are single divisions.
    QueryDef("order_size_histogram", (s, dir) => {
      val sizes = t("lineitem")(s, dir)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("k"))
      val grid = sizes.groupBy(col("k")).agg(count(lit(1)).as("n_orders"))
      val tots = grid.agg(sum(col("n_orders")).as("n_total"),
        sum(col("k") * col("n_orders")).as("lines_total"))
      grid.crossJoin(broadcast(tots))
        .select(col("k"), col("n_orders"),
          (col("n_orders").cast("double") / col("n_total").cast("double"))
            .as("order_share"),
          ((col("k") * col("n_orders")).cast("double") /
            col("lines_total").cast("double")).as("line_share"))
        .orderBy(col("k"))
    }, Some("""
      WITH s AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS k
                 FROM lineitem GROUP BY 1),
      g AS (SELECT k, CAST(count(*) AS BIGINT) AS n_orders FROM s GROUP BY k),
      t AS (SELECT CAST(sum(n_orders) AS BIGINT) AS n_total,
                   CAST(sum(k * n_orders) AS BIGINT) AS lines_total FROM g)
      SELECT k, n_orders,
             CAST(n_orders AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS order_share,
             CAST(k * n_orders AS DOUBLE) / CAST(t.lines_total AS DOUBLE) AS line_share
      FROM g CROSS JOIN t ORDER BY k""")),

    // Return-rate analytics by brand: returned-line share and
    // returned-revenue share per part brand — the product-quality
    // ranking a retailer actually sorts by. Revenue goes through
    // DECIMAL(28,8) (the repo's money rule) before the ratio's single
    // double division; line counts exact.
    QueryDef("return_rate_by_brand", (s, dir) => {
      val li = t("lineitem")(s, dir)
      val p = t("part")(s, dir).select(col("p_partkey"), col("p_brand"))
      val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,8)")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("returned_lines"),
          sum(rev).as("__rev"),
          sum(when(col("l_returnflag") === "R", rev)
            .otherwise(lit(0).cast("decimal(28,8)"))).as("__rrev"))
        .select(col("p_brand"), col("n_lines"), col("returned_lines"),
          col("__rev").cast("double").as("revenue"),
          col("__rrev").cast("double").as("returned_revenue"),
          (col("returned_lines").cast("double") / col("n_lines").cast("double"))
            .as("return_line_rate"),
          (col("__rrev").cast("double") / col("__rev").cast("double"))
            .as("return_revenue_rate"))
        .orderBy(col("p_brand"))
    }, Some("""
      -- revenue sums go DECIMAL→VARCHAR→DOUBLE: past 2^53 of unscaled
      -- units DuckDB's direct decimal→double cast can sit 1 ulp off the
      -- correctly-rounded value (seen at sf1.0) — the ProfilingQueries
      -- route; Spark's Decimal.toDouble is correctly rounded already
      SELECT p_brand,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines,
             CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS revenue,
             CAST(CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))
                           ELSE CAST(0 AS DECIMAL(28,8)) END) AS VARCHAR) AS DOUBLE) AS returned_revenue,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS return_line_rate,
             CAST(CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))
                           ELSE CAST(0 AS DECIMAL(28,8)) END) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE)
               AS return_revenue_rate
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_brand ORDER BY p_brand""")),

    // Stickiness (DAU/WAU) per week: Σ daily-distinct users over the
    // week divided by (n_days · weekly-distinct users) — the classic
    // product-engagement ratio (1.0 = every weekly user active every
    // day). All distinct counts exact integers; one final division.
    QueryDef("stickiness_dau_wau", (s, dir) => {
      val ev = t("events")(s, dir)
        .select(date_trunc("week", col("ts")).cast("date").as("week"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          col("user_id"))
      val daily = ev.groupBy(col("week"), col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
        .groupBy(col("week"))
        .agg(sum(col("dau")).as("sum_dau"), count(lit(1)).as("n_days"))
      val weekly = ev.groupBy(col("week"))
        .agg(countDistinct(col("user_id")).as("wau"))
      daily.join(weekly, Seq("week"))
        .select(col("week").cast("timestamp").as("week"),
          col("n_days"), col("sum_dau"), col("wau"),
          (col("sum_dau").cast("double") /
            (col("n_days") * col("wau")).cast("double")).as("stickiness"))
        .orderBy(col("week"))
    }, Some("""
      WITH e AS (
        SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               user_id
        FROM events),
      d AS (SELECT week, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
            FROM e GROUP BY 1, 2),
      dw AS (SELECT week, CAST(sum(dau) AS BIGINT) AS sum_dau,
                    CAST(count(*) AS BIGINT) AS n_days
             FROM d GROUP BY week),
      w AS (SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM e GROUP BY week)
      SELECT CAST(dw.week AS TIMESTAMP) AS week, n_days, sum_dau, wau,
             CAST(sum_dau AS DOUBLE) / CAST(n_days * wau AS DOUBLE) AS stickiness
      FROM dw JOIN w ON w.week = dw.week
      ORDER BY week""")),

    // RFM segmentation — the classic recency/frequency/monetary customer
    // quartile coding. One grouped pass builds the per-customer triple
    // (last order date, order count, DECIMAL-exact spend); three ntile(4)
    // assignments give quartiles (1 = best) under fully-deterministic
    // orders (metric, custkey tiebreak). rfm_code = 100r + 10f + m.
    // Scale: the per-customer rollup is corpus-cardinality (|customers|
    // rows), so a partition-less ntile window would serialize it through
    // ONE task — instead each quartile comes from GlobalRank.shardedNtile
    // (range-partition → per-partition row_number → bounded prefix-sum
    // offsets), which replicates the standard ntile fill rule exactly —
    // including boundary ties split by row order, since the sort keys are
    // total — while every window stays partitioned. The oracle keeps
    // DuckDB's native ntile: same definition, hash-pinned.
    QueryDef("rfm_segments", (s, dir) => {
      val cust = t("orders")(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(12,2)")).as("__spend"))
        .select(col("o_custkey"), col("last_order"), col("n_orders"),
          col("__spend").cast("double").as("spend"))
      def quart(df: org.apache.spark.sql.DataFrame,
                order: Seq[org.apache.spark.sql.Column], out: String) =
        graft.operators.GlobalRank.shardedNtile(df, 4, order, out)
      val r3 = quart(quart(quart(cust,
        Seq(col("last_order").desc, col("o_custkey")), "r"),
        Seq(col("n_orders").desc, col("o_custkey")), "f"),
        Seq(col("spend").desc, col("o_custkey")), "m")
      r3
        .select(col("o_custkey"),
          col("last_order").cast("timestamp").as("last_order"),
          col("n_orders"), col("spend"),
          (col("r") * 100 + col("f") * 10 + col("m")).as("rfm_code"))
        .orderBy(col("o_custkey"))
    }, Some("""
      WITH c AS (
        SELECT o_custkey, max(CAST(o_orderdate AS TIMESTAMP)) AS last_order,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey),
      q AS (
        SELECT o_custkey, last_order, n_orders, spend,
               ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
               ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f,
               ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS m
        FROM c)
      SELECT o_custkey, CAST(last_order AS TIMESTAMP) AS last_order,
             n_orders, spend,
             CAST(r * 100 + f * 10 + m AS INT) AS rfm_code
      FROM q ORDER BY o_custkey""")),

    // Gopher-style repetition signal: fraction of duplicate word 2-grams
    // per document (1 − distinct/total). High values flag the
    // boilerplate/spam documents a training-data filter drops. Counts are
    // integers; the fraction is one double division, identical on both
    // sides.
    QueryDef("text_repetition", (s, dir) => {
      val toks = graft.functions.TextAnalysisFns.tokens(col("text"))
      val total = greatest(size(toks) - 1, lit(0)).cast("long")
      val dist = size(graft.functions.SimFns.wordShingles(toks, 2)).cast("long")
      t("documents")(s, dir)
        .select(col("doc_id"), total.as("n_2grams"), dist.as("n_distinct"),
          when(total === 0, lit(0.0))
            .otherwise(lit(1.0) - dist.cast("double") / total.cast("double"))
            .as("dup_frac"))
        .orderBy(col("doc_id"))
    }, Some {
      val toks = Sql.tokens("text")
      val sh = Sql.wordShingles("toks", 2)
      s"""
      WITH tk AS (SELECT doc_id, $toks AS toks FROM documents)
      SELECT doc_id,
             CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_2grams,
             CAST(len($sh) AS BIGINT) AS n_distinct,
             CASE WHEN greatest(len(toks) - 1, 0) = 0 THEN 0.0
                  ELSE 1.0 - len($sh) / CAST(greatest(len(toks) - 1, 0) AS DOUBLE)
             END AS dup_frac
      FROM tk ORDER BY doc_id"""
    }),

    // NULL-handling scalar family: nullif, coalesce, nvl2, NULL-ignoring
    // greatest/least (both engines skip NULL args — only all-NULL yields
    // NULL), isnull predicate.
    QueryDef("f28_null_family", (s, dir) => {
      t("customer")(s, dir)
        .withColumn("n", expr("nullif(c_nationkey % 5, 0)"))
        .select(
          col("c_custkey"),
          coalesce(col("n"), lit(-1)).as("n_coalesce"),
          expr("nvl2(n, 'has', 'none')").as("nvl2_val"),
          expr("greatest(n, 2)").as("g2"),
          expr("least(n, 2)").as("l2"),
          expr("isnull(n)").as("n_isnull"))
        .orderBy(col("c_custkey"))
    }, Some("""
      WITH c AS (
        SELECT c_custkey, nullif(c_nationkey % 5, 0) AS n FROM customer)
      SELECT c_custkey,
             coalesce(n, -1) AS n_coalesce,
             CASE WHEN n IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_val,
             greatest(n, 2) AS g2,
             least(n, 2) AS l2,
             n IS NULL AS n_isnull
      FROM c ORDER BY c_custkey""")),

    // Windowed distinct count: Spark windows reject DISTINCT aggregates,
    // so the portable form is max(dense_rank) — dense_rank over the value
    // ordering numbers the distinct values, its partition max IS the
    // distinct count. One shuffle on the partition key; the oracle uses
    // DuckDB's native count(DISTINCT) OVER to prove equivalence.
    QueryDef("win_count_distinct", (s, dir) => {
      val byType = Window.partitionBy(col("event_type"))
      val dr = dense_rank().over(byType.orderBy(col("user_id")))
      t("events")(s, dir)
        .select(col("event_id"), col("event_type"),
          max(dr.cast("long")).over(byType).as("n_users"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, event_type,
             CAST(count(DISTINCT user_id) OVER (PARTITION BY event_type) AS BIGINT) AS n_users
      FROM events ORDER BY event_id""")),

    // Time-series densification: per-user sparse daily counts → a dense
    // gap-filled series over each user's [min_day, max_day] span
    // (sequence + explode, zero-filled left join). The generated rows are
    // bounded by span × users, never by the event count — the shape that
    // holds when the event table is 100 TB but the calendar is small.
    QueryDef("densify_daily", (s, dir) => {
      val ev = t("events")(s, dir).where(col("user_id") <= 20)
        .withColumn("day", to_date(col("ts")))
      val daily = ev.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n"))
      val days = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      days.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day").cast("timestamp").as("day_ts"),
          coalesce(col("n"), lit(0L)).as("n_events"))
        .orderBy(col("user_id"), col("day_ts"))
    }, Some("""
      WITH ev AS (
        SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
        FROM events WHERE user_id <= 20),
      daily AS (SELECT user_id, day, count(*) AS n FROM ev GROUP BY 1, 2),
      span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY 1),
      days AS (
        SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM span)
      SELECT days.user_id, CAST(days.day AS TIMESTAMP) AS day_ts,
             coalesce(daily.n, 0) AS n_events
      FROM days LEFT JOIN daily ON days.user_id = daily.user_id AND days.day = daily.day
      ORDER BY days.user_id, day_ts""")),

    // Funnel conversion: first click → first purchase at-or-after it,
    // converted iff within 24 h. The conditional-min inside the aggregate
    // (not a correlated subquery) keeps it one join + one agg at scale.
    QueryDef("funnel_conversion", (s, dir) => {
      val ev = t("events")(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_click"))
      val buys = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("b_uid"), col("ts").as("buy_ts"))
      clicks.join(buys, col("user_id") === col("b_uid"), "left")
        .groupBy(col("user_id"), col("first_click"))
        .agg(min(when(col("buy_ts") >= col("first_click"), col("buy_ts"))).as("first_buy"))
        .select(col("user_id"), col("first_click"),
          coalesce(col("first_buy") <= col("first_click") + expr("INTERVAL 24 HOURS"),
            lit(false)).as("converted"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH fc AS (
        SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_click
        FROM events WHERE event_type = 'click' GROUP BY 1),
      fb AS (
        SELECT fc.user_id, fc.first_click,
               min(CASE WHEN CAST(e.ts AS TIMESTAMP) >= fc.first_click
                        THEN CAST(e.ts AS TIMESTAMP) END) AS first_buy
        FROM fc LEFT JOIN events e
          ON e.user_id = fc.user_id AND e.event_type = 'purchase'
        GROUP BY 1, 2)
      SELECT user_id, first_click,
             coalesce(first_buy <= first_click + INTERVAL 24 HOURS, false) AS converted
      FROM fb ORDER BY user_id""")),

    // Cohort retention: cohort = week of first activity (trunc is
    // monotonic, so min-then-trunc ≡ trunc-then-min); count distinct
    // users per (cohort, week offset). Integer week offsets via exact
    // day-diff division — both offsets are Monday-aligned multiples of 7.
    QueryDef("cohort_retention", (s, dir) => {
      val ev = t("events")(s, dir)
        .select(col("user_id"), trunc(to_date(col("ts")), "week").as("wk"))
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      ev.join(cohorts, "user_id")
        .groupBy(col("cohort"), expr("datediff(wk, cohort) DIV 7").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .select(col("cohort").cast("timestamp").as("cohort_wk"),
          col("week_offset"), col("n_users"))
        .orderBy(col("cohort_wk"), col("week_offset"))
    }, Some("""
      WITH ev AS (
        SELECT user_id,
               CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        FROM events),
      cohorts AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1)
      SELECT CAST(cohort AS TIMESTAMP) AS cohort_wk,
             CAST(date_diff('day', cohort, wk) // 7 AS BIGINT) AS week_offset,
             count(DISTINCT ev.user_id) AS n_users
      FROM ev JOIN cohorts USING (user_id)
      GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
