package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 breadth: date/math scalar families, UNION/INTERSECT set ops,
  * correlated NOT EXISTS, gaps-and-islands sessionization, SCD-2 history
  * derivation, and the first/last/nth window-value family. Exactness
  * rules as everywhere: integer/date outputs where possible, decimal
  * internal sums, identical double divisions, total ORDER BY.
  *
  * Cross-engine gotchas encoded here (probed against DuckDB 1.0):
  * - DuckDB dayofweek() is 0=Sunday vs Spark's 1=Sunday → use the ISO
  *   form instead (Spark weekday()+1 ≡ DuckDB isodow()).
  * - `%` on negatives truncates in DuckDB but pmod() is positive in
  *   Spark → only apply to non-negative operands.
  * - round() on DECIMAL is HALF_UP in both engines (round on DOUBLE is
  *   engine-dependent at the ulp boundary — never round doubles).
  * - Spark ceil/floor(double) return BIGINT, DuckDB return DOUBLE →
  *   cast the DuckDB side.
  */
object BreadthQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // §2.6 date-function family over the order date: quarter, ISO week +
    // weekday, day-of-year, month/week truncation, month-end, calendar
    // arithmetic. All date or integer outputs — no timezone or libm
    // exposure anywhere.
    QueryDef("f21_date_family", (s, dir) => {
      val od = to_date(col("o_orderdate"))
      t("orders")(s, dir).select(
        col("o_orderkey"),
        quarter(od).as("qtr"),
        weekofyear(od).as("iso_week"),
        (weekday(od) + lit(1)).as("iso_dow"),
        dayofyear(od).as("doy"),
        // DATE columns are cast to TIMESTAMP for output: the driver reads
        // Spark parquet date32 as datetime.date ('1996-08-31') but DuckDB
        // dates surface as datetime64 ('1996-08-31 00:00:00') — same
        // str-render trap as DECIMAL. Midnight-UTC timestamps render
        // identically on both bridges.
        trunc(od, "month").cast("timestamp").as("month_start"),
        trunc(od, "week").cast("timestamp").as("week_start"),
        last_day(od).cast("timestamp").as("month_end"),
        add_months(od, 1).cast("timestamp").as("next_month"),
        datediff(od, lit("2024-01-01").cast("date")).cast("long").as("days_since")
      ).orderBy(col("o_orderkey"))
    }, Some("""
      SELECT o_orderkey,
             quarter(CAST(o_orderdate AS DATE)) AS qtr,
             week(CAST(o_orderdate AS DATE)) AS iso_week,
             isodow(CAST(o_orderdate AS DATE)) AS iso_dow,
             dayofyear(CAST(o_orderdate AS DATE)) AS doy,
             CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_start,
             CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS week_start,
             CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP) AS next_month,
             date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS days_since
      FROM orders ORDER BY o_orderkey""")),

    // §2.6 math-function family: abs/sign/ceil/floor, HALF_UP decimal
    // rounding, positive modulo, exact powers of two, bounded
    // greatest/least, IEEE-correctly-rounded sqrt, and factorial.
    QueryDef("f22_math_family", (s, dir) => {
      val v = col("value")
      t("events")(s, dir).select(
        col("event_id"),
        abs(v).as("abs_v"),
        signum(v).cast("long").as("sgn"),
        ceil(v).as("ceil_v"),
        floor(v).as("floor_v"),
        round(v.cast("decimal(18,6)"), 2).cast("double").as("round2"),
        pmod(col("event_id"), lit(7)).as("m7"),
        pow(lit(2.0), (col("event_id") % 16).cast("double")).as("pw2"),
        greatest(v, lit(50.0)).as("hi"),
        least(v, lit(50.0)).as("lo"),
        sqrt(abs(v)).as("rt"),
        factorial((col("event_id") % 10).cast("int")).as("fact")
      ).orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
             abs(value) AS abs_v,
             CAST(sign(value) AS BIGINT) AS sgn,
             CAST(ceil(value) AS BIGINT) AS ceil_v,
             CAST(floor(value) AS BIGINT) AS floor_v,
             CAST(round(CAST(value AS DECIMAL(18,6)), 2) AS DOUBLE) AS round2,
             event_id % 7 AS m7,
             pow(2.0, CAST(event_id % 16 AS DOUBLE)) AS pw2,
             greatest(value, 50.0) AS hi,
             least(value, 50.0) AS lo,
             sqrt(abs(value)) AS rt,
             CAST(factorial(CAST(event_id % 10 AS INTEGER)) AS BIGINT) AS fact
      FROM events ORDER BY event_id""")),

    // §2.9 UNION (distinct): one hash-distinct over the concatenation —
    // complements a7_union_all / a8_set_except.
    QueryDef("a10_union_distinct", (s, dir) => {
      val buyers = t("events")(s, dir)
        .where(col("event_type") === "purchase")
        .select(col("user_id").as("id"))
      val bigCust = t("orders")(s, dir)
        .where(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("id"))
      buyers.union(bigCust).distinct().orderBy(col("id"))
    }, Some("""
      SELECT user_id AS id FROM events WHERE event_type = 'purchase'
      UNION
      SELECT o_custkey AS id FROM orders WHERE o_totalprice > 400000.0
      ORDER BY id""")),

    // §2.9 INTERSECT: users who both purchased and errored.
    QueryDef("a11_intersect", (s, dir) => {
      val ev = t("events")(s, dir)
      ev.where(col("event_type") === "purchase").select(col("user_id"))
        .intersect(
          ev.where(col("event_type") === "error").select(col("user_id")))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error'
      ORDER BY user_id""")),

    // Correlated NOT EXISTS with an extra predicate — planned as a
    // left-anti join with a compound condition (no subquery re-execution
    // per row; one shuffle on the key).
    QueryDef("j11_not_exists", (s, dir) => {
      val cust = t("customer")(s, dir)
      val big = t("orders")(s, dir)
        .where(col("o_totalprice") > 300000.0)
        .select(col("o_custkey"))
      cust.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey, c_mktsegment FROM customer c
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
      ORDER BY c_custkey""")),

    // Gaps-and-islands: per-user event bursts separated by >10-minute
    // silences. Two window passes over ONE (user) shuffle partitioning:
    // lag → new-island flag → running sum = island id; then a hash agg.
    // The micros axis keeps the gap test integer-exact in both engines.
    QueryDef("gaps_islands", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val flagged = t("events")(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_island",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 600L * 1000000L, 1L).otherwise(0L))
        .withColumn("island",
          sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      flagged.groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"), max(col("len")).as("max_len"))
        .orderBy(col("user_id"))
    }, Some("""
      WITH e AS (
        SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events),
      f AS (
        SELECT user_id, us, event_id,
               CASE WHEN lag(us) OVER w IS NULL
                      OR us - lag(us) OVER w > 600 * 1000000
                    THEN 1 ELSE 0 END AS new_island
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      i AS (
        SELECT user_id,
               sum(new_island) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS island
        FROM f),
      g AS (
        SELECT user_id, island, count(*) AS len
        FROM i GROUP BY user_id, island)
      SELECT user_id, count(*) AS n_islands, max(len) AS max_len
      FROM g GROUP BY user_id ORDER BY user_id""")),

    // SCD type-2 derivation: order events become validity intervals per
    // customer (valid_from = order date, valid_to = next order's date,
    // NULL = current). One (custkey) window shuffle; dedup-per-day picks
    // the highest order key deterministically.
    QueryDef("scd2_order_history", (s, dir) => {
      val wDedup = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val wSeq = Window.partitionBy(col("o_custkey")).orderBy(col("valid_from"))
      t("orders")(s, dir)
        .withColumn("__rn", row_number().over(wDedup)).where(col("__rn") === 1)
        .select(col("o_custkey"), col("o_orderdate").as("valid_from"),
          col("o_totalprice").as("state_price"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeq))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("o_custkey"), col("valid_from"))
    }, Some("""
      WITH d AS (
        SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS valid_from,
               o_totalprice AS state_price
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                   ORDER BY o_orderkey DESC) = 1)
      SELECT o_custkey, valid_from, state_price,
             lead(valid_from) OVER (PARTITION BY o_custkey
                                    ORDER BY valid_from) AS valid_to,
             lead(valid_from) OVER (PARTITION BY o_custkey
                                    ORDER BY valid_from) IS NULL AS is_current
      FROM d ORDER BY o_custkey, valid_from""")),

    // The streaming interval join (Streams.intervalJoin — watermark +
    // two-sided time bound, state evicted by horizon) executed in BATCH
    // mode over the same code path: withWatermark is a no-op on batch
    // frames, so one definition serves both modes. Oracle is the plain
    // inequality join.
    QueryDef("stream_interval_join", (s, dir) => {
      val ev = t("events")(s, dir)
      val errs = ev.where(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("err_ts"),
          col("user_id").as("err_user"))
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts").as("p_ts"),
          col("user_id").as("p_user"))
      graft.streaming.Streams.intervalJoin(errs, purch,
          keys = Seq(("err_user", "p_user")),
          leftTs = "err_ts", rightTs = "p_ts", lookback = "1 hour")
        .select(col("err_id"), col("p_id"))
        .orderBy(col("err_id"), col("p_id"))
    }, Some("""
      WITH e AS (SELECT event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts,
                        user_id FROM events WHERE event_type = 'error'),
           p AS (SELECT event_id AS p_id, CAST(ts AS TIMESTAMP) AS p_ts,
                        user_id FROM events WHERE event_type = 'purchase')
      SELECT err_id, p_id
      FROM e JOIN p ON e.user_id = p.user_id
        AND p.p_ts >= e.err_ts - INTERVAL 1 HOUR AND p.p_ts <= e.err_ts
      ORDER BY err_id, p_id""")),

    // Null-safe equality join (<=> ≡ IS NOT DISTINCT FROM): NULL keys
    // match each other instead of dropping — the semantics a dimension
    // join needs when "unknown" is itself a key value.
    QueryDef("j14_null_safe_eq", (s, dir) => {
      val ev = t("events")(s, dir)
        .select(col("event_id"),
          when(col("event_type") =!= "click", col("event_type")).as("k"))
        .where(col("event_id") <= 2000)
      val dim = ev.sparkSession.createDataFrame(Seq(
        (Option("purchase"), 10L), (Option("error"), 20L),
        (Option.empty[String], 99L))).toDF("k", "code")
      ev.join(dim, ev("k") <=> dim("k"), "inner")
        .select(col("event_id"), col("code"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH ev AS (
        SELECT event_id,
               CASE WHEN event_type <> 'click' THEN event_type END AS k
        FROM events WHERE event_id <= 2000),
      dim(k, code) AS (VALUES ('purchase', 10), ('error', 20), (NULL, 99))
      SELECT event_id, CAST(code AS BIGINT) AS code
      FROM ev JOIN dim ON ev.k IS NOT DISTINCT FROM dim.k
      ORDER BY event_id""")),

    // Safe-cast / safe-divide family (the reference leans on BigQuery
    // SAFE_CAST throughout its MERGE staging): malformed input → NULL,
    // never a failed job. Test strings built by the same CASE on both
    // engines; note DuckDB TRY_CAST('42.7' AS INT) ROUNDS where Spark
    // nulls — only integral/garbage/overflow forms are portable.
    QueryDef("f24_try_family", (s, dir) => {
      val tag = col("event_id") % 4
      val str = when(tag === 0, lit("123")).when(tag === 1, lit("12x"))
        .when(tag === 2, lit("")).otherwise(lit("99999999999"))
      val dts = when(col("event_id") % 3 === 0, lit("2024-02-29 10:00:00"))
        .otherwise(lit("2024-13-01 00:00:00"))
      t("events")(s, dir).select(
        col("event_id"),
        str.try_cast("int").as("as_int"),
        dts.try_cast("timestamp_ntz").as("as_ts"),
        try_divide(col("value"), (col("event_id") % 5).cast("double")).as("ratio")
      ).orderBy(col("event_id"))
    }, Some("""
      WITH x AS (
        SELECT event_id, value,
               CASE event_id % 4 WHEN 0 THEN '123' WHEN 1 THEN '12x'
                                 WHEN 2 THEN '' ELSE '99999999999' END AS str,
               CASE WHEN event_id % 3 = 0 THEN '2024-02-29 10:00:00'
                    ELSE '2024-13-01 00:00:00' END AS dts
        FROM events)
      SELECT event_id,
             TRY_CAST(str AS INTEGER) AS as_int,
             TRY_CAST(dts AS TIMESTAMP) AS as_ts,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE value / CAST(event_id % 5 AS DOUBLE) END AS ratio
      FROM x ORDER BY event_id""")),

    // TPC-H Q6 shape: forecasting revenue change — tight range filters
    // (all pushable to the scan) over a single fact table, one scalar out.
    QueryDef("q6_forecast_revenue", (s, dir) => {
      t("lineitem")(s, dir)
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
    }, Some("""
      SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                  AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
        AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""")),

    // TPC-H Q14 shape: conditional revenue share — promo-branded revenue
    // as a percentage of total, both sums in DECIMAL, one double division
    // at the end (identical rational on both engines).
    QueryDef("q14_promo_share", (s, dir) => {
      val li = t("lineitem")(s, dir)
        .where(col("l_shipdate") >= lit("1995-09-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1995-10-01").cast("timestamp_ntz"))
      val pt = t("part")(s, dir).select(col("p_partkey"), col("p_name"))
      li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_name").startsWith("red"),
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .otherwise(lit(0.0)).cast("decimal(18,4)")).as("__promo"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).as("__total"))
        .select((lit(100.0) * col("__promo").cast("double") /
          col("__total").cast("double")).as("promo_share"))
    }, Some("""
      SELECT 100.0 * CAST(sum(CASE WHEN starts_with(p_name, 'red')
                   THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
                   ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS promo_share
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        AND l_shipdate < TIMESTAMP '1995-10-01'""")),

    // §2.6 string-family second wave: split_part, left/right, ascii/chr,
    // repeat, trim variants, prefix/suffix/contains predicates, sha2-256,
    // edit distance — all narrow codegen projections.
    QueryDef("f23_string_family2", (s, dir) => {
      val nm = col("c_name")
      t("customer")(s, dir).select(
        col("c_custkey"),
        split(nm, "#").getItem(1).as("name_num"),
        substring(nm, 1, 8).as("l8"),
        nm.substr(length(nm) - 1, lit(2)).as("r2"),
        ascii(nm).as("first_code"),
        chr(ascii(nm) + lit(1)).as("next_char"),
        repeat(lit("ab"), 2).as("rep"),
        ltrim(rtrim(concat(lit("  "), nm, lit("  ")))).as("trimmed"),
        nm.startsWith("Customer").as("is_cust"),
        nm.endsWith("1").as("ends_one"),
        nm.contains("000").as("has_zeros"),
        sha2(nm, 256).as("digest"),
        levenshtein(nm, lit("Customer#000000001")).as("edit_dist")
      ).orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey,
             split_part(c_name, '#', 2) AS name_num,
             left(c_name, 8) AS l8,
             right(c_name, 2) AS r2,
             ascii(c_name) AS first_code,
             chr(ascii(c_name) + 1) AS next_char,
             repeat('ab', 2) AS rep,
             ltrim(rtrim('  ' || c_name || '  ')) AS trimmed,
             starts_with(c_name, 'Customer') AS is_cust,
             ends_with(c_name, '1') AS ends_one,
             contains(c_name, '000') AS has_zeros,
             sha256(c_name) AS digest,
             levenshtein(c_name, 'Customer#000000001') AS edit_dist
      FROM customer ORDER BY c_custkey""")),

    // §2.4 explicit GROUPING SETS (completes rollup/cube): two
    // single-dimension slices plus the grand total in ONE aggregate —
    // map-side grouping-set expansion keeps partial aggregation.
    QueryDef("grouping_sets_orders", (s, dir) => {
      t("orders")(s, dir).createOrReplaceTempView("graft_gso_v")
      s.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM graft_gso_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority""")
    }, Some("""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
             coalesce(o_orderpriority, 'ALL') AS priority,
             count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""")),

    // IGNORE NULLS window values: first/last/nth non-null observation per
    // user over a sparsely-populated column — the gap-filling primitive
    // behind last-observation-carried-forward.
    QueryDef("win_ignore_nulls", (s, dir) => {
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t("events")(s, dir)
        .withColumn("sparse",
          when(col("event_type") === "purchase", col("value")))
        .select(col("event_id"),
          first(col("sparse"), ignoreNulls = true).over(frame).as("first_obs"),
          last(col("sparse"), ignoreNulls = true).over(frame).as("last_obs"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH e AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN event_type = 'purchase' THEN value END AS sparse
        FROM events)
      SELECT event_id,
             first_value(sparse IGNORE NULLS) OVER w AS first_obs,
             last_value(sparse IGNORE NULLS) OVER w AS last_obs
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY event_id""")),

    // §2.5 ordering breadth: explicit NULLS FIRST / NULLS LAST on a
    // nullable sort key (both engines default differently — ASC defaults
    // to NULLS LAST in DuckDB but NULLS FIRST in Spark, so the modifiers
    // are load-bearing).
    QueryDef("w5_nulls_order", (s, dir) => {
      t("events")(s, dir)
        .where(col("event_id") <= 500)
        .select(col("event_id"),
          nullif(col("event_type"), lit("click")).as("t_or_null"))
        .orderBy(col("t_or_null").asc_nulls_first, col("event_id").asc)
        .limit(200)
    }, Some("""
      SELECT event_id, nullif(event_type, 'click') AS t_or_null
      FROM events WHERE event_id <= 500
      ORDER BY t_or_null ASC NULLS FIRST, event_id ASC
      LIMIT 200""")),

    // §2.3 FULL OUTER join: users seen in events vs customers — both
    // unmatched sides preserved. Aggregated first so the join is
    // key-to-key (scale: two shuffles on the key, no row explosion).
    QueryDef("j12_full_outer", (s, dir) => {
      val ev = t("events")(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val cust = t("customer")(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      ev.join(cust, col("user_id") === col("c_custkey"), "full_outer")
        .select(
          coalesce(col("user_id"), col("c_custkey")).as("id"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("c_mktsegment"), lit("<none>")).as("segment"))
        .orderBy(col("id"))
    }, Some("""
      WITH ev AS (
        SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
      SELECT coalesce(user_id, c_custkey) AS id,
             coalesce(n_events, 0) AS n_events,
             coalesce(c_mktsegment, '<none>') AS segment
      FROM ev FULL OUTER JOIN customer ON user_id = c_custkey
      ORDER BY id""")),

    // §2.3 bounded CROSS join: region × region ordered pairs (5×5) —
    // the legitimate cartesian case is a tiny dimension square.
    QueryDef("j13_cross_join", (s, dir) => {
      val r1 = t("region")(s, dir).select(col("r_regionkey").as("a"))
      val r2 = t("region")(s, dir).select(col("r_regionkey").as("b"))
      r1.crossJoin(r2)
        .select(col("a"), col("b"), (col("a") * 5 + col("b")).as("pair_id"))
        .orderBy(col("a"), col("b"))
    }, Some("""
      SELECT r1.r_regionkey AS a, r2.r_regionkey AS b,
             r1.r_regionkey * 5 + r2.r_regionkey AS pair_id
      FROM region r1 CROSS JOIN region r2
      ORDER BY a, b""")),

    // Per-group top-k through the custom TypedImperativeAggregate
    // (TopKAgg): partial states carry ≤2k pairs per group, so the shuffle
    // is O(groups × k) — the window-row_number oracle shuffles and sorts
    // every row. Same rows, structurally cheaper plan.
    QueryDef("topk_per_segment", (s, dir) => {
      val cust = t("customer")(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      t("orders")(s, dir)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(graft.expressions.TopKAgg.topK(
          struct(col("o_totalprice"), col("o_orderkey")), 3).as("top"))
        .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("c_mktsegment"), (col("pos") + 1).cast("long").as("rank"),
          col("e.score").as("price"), col("e.id").as("o_orderkey"))
        .orderBy(col("c_mktsegment"), col("rank"))
    }, Some("""
      SELECT c_mktsegment, CAST(rn AS BIGINT) AS rank,
             o_totalprice AS price, o_orderkey
      FROM (
        SELECT c_mktsegment, o_totalprice, o_orderkey,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey)
      WHERE rn <= 3 ORDER BY c_mktsegment, rank""")),

    // CDC log compaction: keep each key's latest record (ts desc,
    // event_id desc tiebreak) — the standing materialization step between
    // an append-only change log and a queryable table. One window shuffle;
    // at scale this is the compaction pass of every incremental pipeline.
    QueryDef("compact_latest", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t("events")(s, dir)
        .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
        .select(col("user_id"), col("event_id").as("latest_event_id"),
          col("event_type").as("latest_type"), col("value").as("latest_value"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT user_id, event_id AS latest_event_id,
             event_type AS latest_type, value AS latest_value
      FROM events
      QUALIFY row_number() OVER (PARTITION BY user_id
                                 ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                          event_id DESC) = 1
      ORDER BY user_id""")),

    // Fixed-width histogram over a numeric column — bucket index from
    // exact integer floor math (identical in both engines; no
    // width_bucket builtin dependence). Map-side combinable single agg.
    QueryDef("histogram_value", (s, dir) => {
      val nBuckets = 20
      val bucket = least(greatest(floor(col("value") / 5.0), lit(0.0)),
        lit((nBuckets - 1).toDouble)).cast("long")
      t("events")(s, dir)
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("lo"), max(col("value")).as("hi"))
        .orderBy(col("bucket"))
    }, Some("""
      SELECT CAST(least(greatest(floor(value / 5.0), 0.0), 19.0) AS BIGINT)
               AS bucket,
             count(*) AS n, min(value) AS lo, max(value) AS hi
      FROM events GROUP BY 1 ORDER BY bucket""")),

    // Correlated scalar subquery in the SELECT list, written as SQL text
    // on BOTH engines: Catalyst decorrelates it into a left outer
    // aggregate join (visible in .explain — no per-row re-execution),
    // which is exactly how it must run at scale.
    QueryDef("scalar_subquery_select", (s, dir) => {
      t("customer")(s, dir).createOrReplaceTempView("graft_cust_v")
      t("orders")(s, dir).createOrReplaceTempView("graft_orders_v")
      s.sql("""
        SELECT c_custkey,
               (SELECT count(*) FROM graft_orders_v o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               (SELECT CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                FROM graft_orders_v o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F') AS max_final_price
        FROM graft_cust_v c ORDER BY c_custkey""")
    }, Some("""
      SELECT c_custkey,
             (SELECT count(*) FROM orders o
              WHERE o.o_custkey = c.c_custkey) AS n_orders,
             (SELECT CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderstatus = 'F') AS max_final_price
      FROM customer c ORDER BY c_custkey""")),

    // §2.4 conditional-aggregate family: count_if / bool_or / bool_and /
    // counted CASE — one hash aggregate, partial-agg friendly (each is a
    // plain commutative accumulator).
    QueryDef("a12_conditional_agg", (s, dir) => {
      t("events")(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count_if(col("value") > 50.0).as("n_hi"),
          bool_or(col("value") > 99.9).as("any_top"),
          bool_and(col("value") >= 0.0).as("all_nonneg"),
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_even_user"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
             CAST(count_if(value > 50.0) AS BIGINT) AS n_hi,
             bool_or(value > 99.9) AS any_top,
             bool_and(value >= 0.0) AS all_nonneg,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_even_user
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // §2.1/§2.6 positional explode: token stream with ordinals — the
    // LATERAL VIEW posexplode shape (flatten with provenance). Narrow
    // generate stage, no shuffle until the final sort.
    QueryDef("s12_posexplode", (s, dir) => {
      val toks = graft.functions.TextAnalysisFns.tokens(col("text"))
      t("documents")(s, dir)
        .where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), posexplode(toks).as(Seq("pos", "token")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("ord"), col("token"))
        .orderBy(col("doc_id"), col("ord"))
    }, Some(s"""
      WITH d AS (
        SELECT doc_id, ${Sql.tokens("text")} AS toks
        FROM documents WHERE doc_id % 10 = 0)
      SELECT doc_id, generate_subscripts(toks, 1) AS ord, unnest(toks) AS token
      FROM d ORDER BY doc_id, ord""")),

    // Native session_window sessionization — the operator a 100 TB
    // sessionization actually uses (one (user) shuffle, sessions merged
    // inside the aggregate; streaming-capable with a watermark). Oracle is
    // the first-principles islands formulation; boundary rule (exact-gap
    // event merges, silence must EXCEED the gap to split) pinned by
    // SessionWindowBoundarySpec.
    QueryDef("session_window_native", (s, dir) => {
      t("events")(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("sw.start").cast("timestamp_ntz").as("session_start"),
          col("sw.end").cast("timestamp_ntz").as("session_end_padded"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }, Some("""
      WITH o AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               lag(CAST(ts AS TIMESTAMP)) OVER
                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        FROM events),
      f AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS newf
        FROM o),
      i AS (
        SELECT user_id, ts,
               sum(newf) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
        FROM f)
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end_padded,
             count(*) AS n_events
      FROM i GROUP BY user_id, session_id
      ORDER BY user_id, session_start""")),

    // The custom Catalyst expressions exercised through their SQL names
    // (GraftSqlFunctions via SparkSessionExtensions.injectFunction): the
    // whole query is a spark.sql string, proving the SQL API surface —
    // not just the Column API — reaches the codegen'd expressions.
    // (head is bounded to 120 chars: the engine-side CharNgrams is one
    // compiled pass, but the oracle's list formulation is O(len²) per doc
    // — unbounded text made the sf0.1 DuckDB check run for minutes)
    QueryDef("s11_sql_functions", (s, dir) => {
      t("documents")(s, dir).createOrReplaceTempView("graft_docs_v")
      s.sql("""
        SELECT doc_id,
               CAST(size(graft_char_ngrams(substring(text, 1, 120), 3)) AS BIGINT) AS n3,
               CAST(graft_ngram_intersect(
                      graft_char_ngrams(substring(text, 1, 120), 3),
                      graft_char_ngrams('language model training data', 3))
                    AS BIGINT) AS probe_hits,
               graft_jaccard_geq(
                 graft_char_ngrams(substring(text, 1, 120), 3, true),
                 graft_char_ngrams('language model training data', 3, true),
                 0.05D) AS sim_flag
        FROM graft_docs_v ORDER BY doc_id""")
    }, Some(s"""
      WITH h AS (SELECT doc_id, text[1:120] AS head FROM documents)
      SELECT doc_id,
             len(${Sql.charNgrams("head", "3")}) AS n3,
             len(list_intersect(${Sql.charNgrams("head", "3")},
                                ${Sql.charNgrams("'language model training data'", "3")})) AS probe_hits,
             ${Sql.jaccard(Sql.charNgrams("head", "3"),
                           Sql.charNgrams("'language model training data'", "3"))} >= 0.05 AS sim_flag
      FROM h ORDER BY doc_id""")),

    // Window value family: first/last/nth over an explicit full frame
    // (full frame makes last/nth deterministic), plus percent-of-group —
    // the denominator summed in DECIMAL (order-free) and divided in
    // double, identically on both sides.
    QueryDef("win_first_last", (s, dir) => {
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val grp = Window.partitionBy(col("user_id"))
      t("events")(s, dir).select(
          col("event_id"), col("user_id"), col("ts"), col("value"))
        .withColumn("first_v", first(col("value")).over(frame))
        .withColumn("last_v", last(col("value")).over(frame))
        .withColumn("second_v", nth_value(col("value"), 2).over(frame))
        .withColumn("pct", col("value") /
          sum(col("value").cast("decimal(18,4)")).over(grp).cast("double"))
        .select(col("event_id"), col("first_v"), col("last_v"),
          col("second_v"), col("pct"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
             first_value(value) OVER w AS first_v,
             last_value(value) OVER w AS last_v,
             nth_value(value, 2) OVER w AS second_v,
             value / CAST(sum(CAST(value AS DECIMAL(18,4)))
                            OVER (PARTITION BY user_id) AS DOUBLE) AS pct
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY event_id"""))
  )
}
