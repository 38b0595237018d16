package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.SketchFns
import graft.operators.IntervalJoin

/** Third-wave operators: distributed sketches with exact oracles
  * (HyperLogLog, Count-Min — every hash is an md5 prefix and every
  * floating-point step is either integer-scaled or the identical double
  * expression on both engines), interval-overlap join via the binned
  * equi-join plan, CUBE grouping sets, the ranking window family, and
  * time-RANGE window frames.
  */
object AdvancedQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // HyperLogLog distinct-count (m=512): registers are a
    // groupBy(bucket).max(rho) — map-side combinable, the shuffle carries
    // at most 512 partial registers per mapper, never rows. The harmonic
    // sum is fixed-point (scaled 2^52, pure BIGINT) so no float addition
    // order exists; only the final constant-factor division is double, and
    // it is the same expression in both engines. At 100 TB this replaces a
    // full-width count-distinct shuffle with a 512-row aggregate.
    QueryDef("sketch_hll_distinct", (s, dir) => {
      val ev = t("events")(s, dir)
      val h = SketchFns.hash60(col("event_id"))
      val regs = ev
        .select(SketchFns.hllBucket(h).as("bucket"),
          SketchFns.hllRho(SketchFns.hllRem(h)).as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("maxrho"))
      val summed = regs.agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - maxrho)")).as("sp"),
        count(lit(1)).as("nb"))
      val exact = ev.agg(countDistinct(col("event_id")).as("n_exact"))
      exact.crossJoin(summed)
        .select(col("n_exact"),
          SketchFns.hllEstimate(col("sp"), col("nb")).as("hll_estimate"))
        .orderBy(col("n_exact"))
    }, Some(s"""
      WITH h AS (
        SELECT ${Sql.hash60("event_id")} AS h FROM events
      ), b AS (
        SELECT h >> ${SketchFns.HllP + 42} AS bucket,
               h & ${(1L << SketchFns.HllRemBits) - 1} AS rem FROM h
      ), r AS (
        SELECT bucket, ${Sql.hllRho("rem")} AS rho FROM b
      ), m AS (
        SELECT bucket, max(rho) AS maxrho FROM r GROUP BY bucket
      ), s AS (
        SELECT sum(1::BIGINT << (52 - maxrho)) AS sp, count(*) AS nb FROM m
      )
      SELECT (SELECT count(DISTINCT event_id) FROM events) AS n_exact,
             0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
               * 4503599627370496.0
               / CAST(sp + (512 - nb) * 4503599627370496 AS DOUBLE)
               AS hll_estimate
      FROM s ORDER BY n_exact""")),

    // Count-Min frequency sketch (d=4 rows × w=256): the matrix is a
    // groupBy(row, cell).count — 1024 cells after partial agg regardless of
    // input size; probes broadcast-join the matrix. Estimates are exact
    // integer counts (min over 4 cells), overestimate-only by construction.
    QueryDef("sketch_cms_user_counts", (s, dir) => {
      val ev = t("events")(s, dir)
      val rowsJ = explode(sequence(lit(0), lit(3))).as("j")
      val sketch = ev.select(col("user_id"), rowsJ)
        .groupBy(col("j"),
          SketchFns.cmsCell(col("j"), col("user_id"), 256).as("cell"))
        .agg(count(lit(1)).as("cnt"))
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      val probes = exact.select(col("user_id"), col("n_exact"), rowsJ)
        .withColumn("cell", SketchFns.cmsCell(col("j"), col("user_id"), 256))
      probes.join(broadcast(sketch), Seq("j", "cell"))
        .groupBy(col("user_id"), col("n_exact"))
        .agg(min(col("cnt")).as("n_est"))
        .orderBy(col("n_exact").desc, col("user_id"))
        .limit(25)
    }, Some(s"""
      WITH rows_ AS (SELECT unnest(generate_series(0, 3)) AS j),
      sketch AS (
        SELECT j, ${Sql.cmsCell("j", "user_id", 256)} AS cell, count(*) AS cnt
        FROM events CROSS JOIN rows_ GROUP BY 1, 2
      ),
      exact AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1),
      probes AS (
        SELECT e.user_id, e.n_exact, s.cnt
        FROM exact e CROSS JOIN rows_ r
        JOIN sketch s ON s.j = r.j
         AND s.cell = ${Sql.cmsCell("r.j", "e.user_id", 256)}
      )
      SELECT user_id, n_exact, min(cnt) AS n_est
      FROM probes GROUP BY user_id, n_exact
      ORDER BY n_exact DESC, user_id LIMIT 25""")),

    // Grouped HLL: the register table keys by (group, bucket), so the
    // sketch composes with ordinary aggregation — distinct event_ids per
    // event_type estimated without a per-group count-distinct shuffle.
    // (Raw estimator only: per-group cardinality here is ≫ 2.5m, outside
    // the linear-counting regime — its ln() correction would not be
    // bit-portable across engines.)
    QueryDef("sketch_hll_grouped", (s, dir) => {
      val ev = t("events")(s, dir)
      val h = SketchFns.hash60(col("event_id"))
      val regs = ev
        .select(col("event_type"), SketchFns.hllBucket(h).as("bucket"),
          SketchFns.hllRho(SketchFns.hllRem(h)).as("rho"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(max(col("rho")).as("maxrho"))
      val summed = regs.groupBy(col("event_type")).agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - maxrho)")).as("sp"),
        count(lit(1)).as("nb"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("event_id")).as("n_exact"))
      exact.join(summed, Seq("event_type"))
        .select(col("event_type"), col("n_exact"),
          SketchFns.hllEstimate(col("sp"), col("nb")).as("hll_estimate"))
        .orderBy(col("event_type"))
    }, Some(s"""
      WITH h AS (
        SELECT event_type, ${Sql.hash60("event_id")} AS h FROM events
      ), b AS (
        SELECT event_type, h >> ${SketchFns.HllP + 42} AS bucket,
               h & ${(1L << SketchFns.HllRemBits) - 1} AS rem FROM h
      ), r AS (
        SELECT event_type, bucket, ${Sql.hllRho("rem")} AS rho FROM b
      ), m AS (
        SELECT event_type, bucket, max(rho) AS maxrho
        FROM r GROUP BY event_type, bucket
      ), s AS (
        SELECT event_type, sum(1::BIGINT << (52 - maxrho)) AS sp,
               count(*) AS nb
        FROM m GROUP BY event_type
      ), x AS (
        SELECT event_type, count(DISTINCT event_id) AS n_exact
        FROM events GROUP BY event_type
      )
      SELECT x.event_type, x.n_exact,
             0.7213 / (1.0 + 1.079 / 512.0) * 512.0 * 512.0
               * 4503599627370496.0
               / CAST(sp + (512 - nb) * 4503599627370496 AS DOUBLE)
               AS hll_estimate
      FROM x JOIN s ON x.event_type = s.event_type
      ORDER BY x.event_type""")),

    // Several DISTINCT aggregates in one pass — Catalyst plans this with
    // an Expand (one stream per distinct set) feeding a single shuffle,
    // not one job per aggregate.
    QueryDef("a9_multi_distinct", (s, dir) => {
      t("events")(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("value").cast("decimal(10,2)")).as("n_values"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }, Some("""
      SELECT event_type,
             count(DISTINCT user_id) AS n_users,
             count(DISTINCT CAST(value AS DECIMAL(10,2))) AS n_values,
             count(*) AS n_events
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // §2.6 breadth — regexp family (extract_all count, first match, rlike,
    // global replace), reduced to scalars.
    QueryDef("f20_regexp_family", (s, dir) => {
      t("documents")(s, dir)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .cast("long").as("n_nums"),
          regexp_extract(col("text"), "[0-9]+", 0).as("first_num"),
          col("text").rlike("data|model").as("has_kw"),
          length(regexp_replace(col("text"), "[aeiou]", ""))
            .cast("long").as("novowel_len"))
        .orderBy(col("doc_id"))
    }, Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
             coalesce(regexp_extract(text, '[0-9]+'), '') AS first_num,
             regexp_matches(text, 'data|model') AS has_kw,
             CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
               AS novowel_len
      FROM documents ORDER BY doc_id""")),

    // Keyed interval-overlap join: purchase windows × error windows of the
    // same user. The engine plan is the binned equi-join (IntervalJoin:
    // one (key, bin) shuffle, local first-bin dedup — no theta-join, no
    // distinct); the oracle is the plain inequality join.
    QueryDef("interval_overlap", (s, dir) => {
      val ev = t("events")(s, dir)
      def win(kind: String, idAs: String) = ev
        .where(col("event_type") === kind)
        .select(col("user_id"), col("event_id").as(idAs),
          col("ts").as(s"${idAs}_s"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as(s"${idAs}_e"))
      IntervalJoin.overlap(win("purchase", "p_id"), win("error", "x_id"),
          Seq("user_id"), "p_id_s", "p_id_e", "x_id_s", "x_id_e",
          binMicros = 2L * 3600L * 1000000L)
        .select(col("user_id"), col("p_id"), col("x_id"))
        .orderBy(col("p_id"), col("x_id"))
    }, Some("""
      SELECT p.user_id, p.event_id AS p_id, x.event_id AS x_id
      FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS s,
                   CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS e
            FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS s,
                   CAST(ts AS TIMESTAMP) + INTERVAL 2 HOUR AS e
            FROM events WHERE event_type = 'error') x
        ON p.user_id = x.user_id AND p.s <= x.e AND x.s <= p.e
      ORDER BY p_id, x_id""")),

    // CUBE over (priority, status): all four grouping sets in one pass,
    // expanded map-side so partial aggregation stays intact.
    QueryDef("cube_order_totals", (s, dir) => {
      t("orders")(s, dir)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    }, Some("""
      SELECT o_orderpriority, o_orderstatus,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             GROUPING(o_orderpriority, o_orderstatus) AS gid
      FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
      ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")),

    // Ranking window family over a total per-partition order: rank,
    // dense_rank, percent_rank (same (rank-1)/(n-1) double division in
    // both engines), ntile, lead. One window shuffle keyed by user.
    QueryDef("win_rank_family", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      t("events")(s, dir)
        .select(col("event_id"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          ntile(4).over(w).as("quartile"),
          lead(col("event_id"), 1).over(w).as("next_id"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
             rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk,
             CAST(percent_rank() OVER w AS DOUBLE) AS prnk,
             ntile(4) OVER w AS quartile,
             lead(event_id, 1) OVER w AS next_id
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
      ORDER BY event_id""")),

    // Scalar-subquery filter: rows above the global mean — the aggregate
    // is computed once and broadcast to the filter (a 1-row build side),
    // never collected to the driver.
    QueryDef("scalar_subquery_above_avg", (s, dir) => {
      val or = t("orders")(s, dir)
      val thr = or.agg(
        (sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("__thr"))
      or.crossJoin(broadcast(thr))
        .where(col("o_totalprice") > col("__thr"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_above"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, count(*) AS n_above,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders
      WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                        AS DOUBLE) / count(*) FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Post-aggregation predicate (HAVING): repeat buyers only. The filter
    // sits above the partial-agg + final-agg pair, so it prunes after one
    // shuffle — no second pass.
    QueryDef("having_repeat_buyers", (s, dir) => {
      t("orders")(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
        .where(col("n_orders") >= 15)
        .orderBy(col("o_custkey"))
    }, Some("""
      SELECT o_custkey, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey HAVING count(*) >= 15
      ORDER BY o_custkey""")),

    // §2.6 breadth — string-function family in one narrow projection
    // (upper, lpad, reverse, position, substring, printf-format,
    // translate), all codegen'd built-ins.
    QueryDef("f18_string_family", (s, dir) => {
      t("customer")(s, dir)
        .select(col("c_custkey"),
          upper(col("c_name")).as("name_upper"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("key_padded"),
          reverse(col("c_name")).as("name_rev"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          format_string("%s|%d", col("c_mktsegment"), col("c_custkey")).as("seg_key"),
          translate(lower(col("c_mktsegment")), "aeiou", "AEIOU").as("seg_tr"))
        .orderBy(col("c_custkey"))
    }, Some("""
      SELECT c_custkey,
             upper(c_name) AS name_upper,
             lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
             reverse(c_name) AS name_rev,
             CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
             substr(c_name, 1, 8) AS name_prefix,
             printf('%s|%d', c_mktsegment, c_custkey) AS seg_key,
             translate(lower(c_mktsegment), 'aeiou', 'AEIOU') AS seg_tr
      FROM customer ORDER BY c_custkey""")),

    // §2.6 breadth — array-function family over tokenized documents,
    // reduced to scalars (array-valued outputs are forbidden by the
    // exactness rules: element order differs across engines).
    QueryDef("f19_array_family", (s, dir) => {
      val toks = graft.functions.TextAnalysisFns.tokens(col("text"))
      t("documents")(s, dir)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_toks"),
          concat_ws(" ", slice(toks, 1, 3)).as("first3"),
          array_contains(toks, "data").as("has_data"),
          array_position(toks, "data").as("data_pos"),
          element_at(toks, -1).as("last_tok"),
          array_min(toks).as("min_tok"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_toks,
             array_to_string(toks[1:3], ' ') AS first3,
             list_contains(toks, 'data') AS has_data,
             CAST(coalesce(list_position(toks, 'data'), 0) AS BIGINT) AS data_pos,
             toks[-1] AS last_tok,
             list_min(toks) AS min_tok
      FROM (SELECT doc_id, ${Sql.tokens("text")} AS toks FROM documents)
      ORDER BY doc_id""")),

    // Time-RANGE window frame: trailing 1-hour sum per user, frame bounds
    // on the numeric event-time axis (micros) — RANGE peers make the
    // result independent of tie order; DECIMAL addition inside the frame
    // makes it independent of re-aggregation order.
    QueryDef("win_range_1h", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      t("events")(s, dir)
        .select(col("event_id"),
          sum(col("value").cast("decimal(14,2)")).over(w)
            .cast("double").as("val_1h"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
             CAST(sum(CAST(value AS DECIMAL(14,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS val_1h
      FROM events ORDER BY event_id"""))
  )
}
