package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextAnalysisFns, VecFns}
import graft.operators.{Ann, AsOfJoin, RangeJoin, Sampling}

/** Second-wave analytics operators: temporal joins (as-of, bounded range),
  * OLAP shapes (rollup, pivot, analytic windows), IVF ANN with an
  * in-SQL quantizer oracle, TF-IDF corpus ranking, and stratified
  * sampling. Every query keeps the repo's exactness rules: decimal
  * internal aggregation, double-only outputs, total ORDER BY, identical
  * operation trees on both engines.
  */
object AnalyticsQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // As-of join (backward): for each error event, the most recent
    // purchase by the same user at or before it — the classic "state at
    // event time" lookup (the reference's cache-lookup shape stretched to
    // event time). Right side deduped per (user, ts) to make the as-of
    // row well-defined; oracle is DuckDB's native ASOF LEFT JOIN.
    QueryDef("asof_prev_purchase", (s, dir) => {
      val ev = t("events")(s, dir)
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val wDedup = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val purchases = ev.where(col("event_type") === "purchase")
        .withColumn("__rn", row_number().over(wDedup)).where(col("__rn") === 1)
        .select(col("user_id"), col("ts").as("pts"),
          col("event_id").as("prev_purchase_id"),
          col("value").as("prev_purchase_value"))
      AsOfJoin.backward(errors, purchases, Seq("user_id"), "ts", "pts",
          Seq("prev_purchase_id", "prev_purchase_value"))
        .select(col("event_id"), col("prev_purchase_id"), col("prev_purchase_value"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
               event_id AS prev_purchase_id, value AS prev_purchase_value
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) = 1),
      e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets
            FROM events WHERE event_type = 'error')
      SELECT e.event_id, p.prev_purchase_id, p.prev_purchase_value
      FROM e ASOF LEFT JOIN p
        ON e.user_id = p.user_id AND e.ets >= p.pts
      ORDER BY e.event_id""")),

    // Forward as-of: per error event, the user's NEXT purchase at-or-
    // after it — AsOfJoin.forward (backward-fill over the following
    // frame), oracle is DuckDB's ASOF with the inequality reversed.
    QueryDef("asof_next_purchase", (s, dir) => {
      val ev = t("events")(s, dir)
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val wDedup = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id"))
      val purchases = ev.where(col("event_type") === "purchase")
        .withColumn("__rn", row_number().over(wDedup)).where(col("__rn") === 1)
        .select(col("user_id"), col("ts").as("pts"),
          col("event_id").as("next_purchase_id"),
          col("value").as("next_purchase_value"))
      AsOfJoin.forward(errors, purchases, Seq("user_id"), "ts", "pts",
          Seq("next_purchase_id", "next_purchase_value"))
        .select(col("event_id"), col("next_purchase_id"), col("next_purchase_value"))
        .orderBy(col("event_id"))
    }, Some("""
      WITH p AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS pts,
               event_id AS next_purchase_id, value AS next_purchase_value
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id) = 1),
      e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ets
            FROM events WHERE event_type = 'error')
      SELECT e.event_id, p.next_purchase_id, p.next_purchase_value
      FROM e ASOF LEFT JOIN p
        ON e.user_id = p.user_id AND e.ets <= p.pts
      ORDER BY e.event_id""")),

    // Bounded-window range join: per error event, count + value of the
    // same user's purchases in the preceding hour. The binned equi-join
    // plan (RangeJoin) vs the oracle's plain inequality join.
    QueryDef("range_recent_purchases", (s, dir) => {
      val ev = t("events")(s, dir)
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"),
          col("event_id").as("p_id"), col("value").as("p_value"))
      val pairs = RangeJoin.recentPairs(errors, purchases, Seq("user_id"),
        "ts", "pts", windowMicros = 3600L * 1000000L)
      val counted = pairs.groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_recent"),
          sum(col("p_value").cast("decimal(12,2)")).cast("double").as("recent_value"))
      errors.select(col("event_id"))
        .join(counted, Seq("event_id"), "left")
        .select(col("event_id"),
          coalesce(col("n_recent"), lit(0L)).as("n_recent"),
          coalesce(col("recent_value"), lit(0.0)).as("recent_value"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT e.event_id,
             count(p.event_id) AS n_recent,
             coalesce(CAST(sum(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE),
                      0.0) AS recent_value
      FROM events e
      LEFT JOIN events p
        ON p.user_id = e.user_id AND p.event_type = 'purchase'
       AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL 1 HOUR
       AND CAST(p.ts AS TIMESTAMP) <  CAST(e.ts AS TIMESTAMP)
      WHERE e.event_type = 'error'
      GROUP BY e.event_id ORDER BY e.event_id""")),

    // ROLLUP with grouping id — subtotal + grand-total rows in one pass
    // (partial-aggregate friendly: Spark expands grouping sets map-side).
    QueryDef("rollup_order_totals", (s, dir) => {
      t("orders")(s, dir)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
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
      FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")),

    // Analytic window: per-user previous value + delta (lag) — the
    // "compare to previous reading" sensor/event shape.
    QueryDef("win_lag_delta", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t("events")(s, dir)
        .select(col("event_id"), col("user_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"))
        .withColumn("delta", col("value") - col("prev_value"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, user_id, value,
             lag(value) OVER w AS prev_value,
             value - lag(value) OVER w AS delta
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
      ORDER BY event_id""")),

    // Sliding-frame window: trailing 4-row sum/avg per user. The frame sum
    // runs in DECIMAL (frame re-aggregation order differs between engines;
    // decimal addition is order-independent), final math in double.
    QueryDef("win_moving_avg", (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      t("events")(s, dir)
        .select(col("event_id"),
          sum(col("value").cast("decimal(12,2)")).over(w).cast("double").as("mov_sum"),
          count(lit(1)).over(w).as("mov_n"))
        .withColumn("mov_avg", col("mov_sum") / col("mov_n").cast("double"))
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id,
             CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS mov_sum,
             count(*) OVER w AS mov_n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
               / CAST(count(*) OVER w AS DOUBLE) AS mov_avg
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")),

    // PIVOT: long→wide status counts per priority (explicit value list —
    // the only scale-safe pivot: no driver-side distinct-values scan).
    QueryDef("pivot_status_counts", (s, dir) => {
      t("orders")(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority,
             count(*) FILTER (o_orderstatus = 'F') AS n_f,
             count(*) FILTER (o_orderstatus = 'O') AS n_o,
             count(*) FILTER (o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // IVF ANN, oracle-backed end to end: the coarse quantizer is the
    // iteration-0 index (centroids = the nlist lowest-id embeddings —
    // fully derivable inside SQL, unlike Lloyd-iterated means whose
    // distributed double sums are not bit-reproducible), nprobe=2, exact
    // cosine rank within probed cells. The Lloyd-trained path is covered
    // by the recall spec; THIS query pins the cell-assignment, probe and
    // rank plumbing to an exact cross-engine oracle.
    QueryDef("ann_topk_ivf", (s, dir) => {
      val emb = t("embeddings")(s, dir)
      val index = CorpusFronts.ivfIndex(s, dir, nlist = 8)
      Ann.ivfTopK(emb.where(col("vec_id") < 10), emb, "vec_id", "embedding",
          k = 5, index, nprobe = 2)
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }, Some {
      // ||v−c||² = v·v − 2 v·c + c·c, same operation tree as Ann.distSqTo
      def distSq(v: String, c: String): String =
        s"(${Sql.dot(v, v)} - 2.0 * ${Sql.dot(v, c)} + ${Sql.dot(c, c)})"
      s"""
      WITH cent AS (
        SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings WHERE vec_id < 8),
      corp AS (SELECT vec_id, embedding AS v FROM embeddings),
      assign AS (
        SELECT corp.vec_id, cent.cid,
               row_number() OVER (PARTITION BY corp.vec_id
                 ORDER BY ${distSq("corp.v", "cent.cv")}, cent.cid) AS rn
        FROM corp CROSS JOIN cent),
      cells  AS (SELECT vec_id, cid AS cell FROM assign WHERE rn = 1),
      probes AS (SELECT vec_id, cid AS cell FROM assign
                 WHERE rn <= 2 AND vec_id < 10),
      cand AS (
        SELECT p.vec_id AS query_id, ce.vec_id AS neighbor_id,
               q.embedding AS qv, c.embedding AS cv
        FROM probes p
        JOIN cells ce ON ce.cell = p.cell AND ce.vec_id <> p.vec_id
        JOIN embeddings q ON q.vec_id = p.vec_id
        JOIN embeddings c ON c.vec_id = ce.vec_id)
      SELECT query_id, neighbor_id, ${Sql.cosine("qv", "cv")} AS cosine,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY ${Sql.cosine("qv", "cv")} DESC, neighbor_id) AS INT) AS rank
      FROM cand
      QUALIFY rank <= 5
      ORDER BY query_id, rank"""
    }),

    // TF-IDF top terms per document (raw idf = N/df — a ratio of exact
    // counts, so the score is the same two double ops in both engines;
    // log-scaled idf would hostage exactness to libm rounding).
    QueryDef("tfidf_top_terms", (s, dir) => {
      val docs = t("documents")(s, dir).select(col("doc_id"), col("text"))
      val tf = docs
        .select(col("doc_id"), explode(TextAnalysisFns.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf").cast("double") *
          (col("n_docs").cast("double") / col("df").cast("double")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("score"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }, Some(s"""
      WITH toks AS (
        SELECT doc_id, unnest(${Sql.tokens("text")}) AS term FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_docs FROM documents)
      SELECT doc_id, term,
             CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY CAST(tf AS DOUBLE) * (CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) DESC,
                        term) AS INT) AS rank
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
      QUALIFY rank <= 3
      ORDER BY doc_id, rank""")),

    // UNPIVOT (wide→long melt): one row per (lineitem, metric). Spark's
    // native unpivot ≡ the oracle's UNION ALL expansion. Narrow op — no
    // shuffle, output is |rows| × |metrics|.
    QueryDef("unpivot_metrics", (s, dir) => {
      t("lineitem")(s, dir)
        .where(col("l_orderkey") < 3000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("extendedprice"),
          col("l_discount").cast("double").as("discount"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("quantity"), col("extendedprice"), col("discount")),
          "metric", "metric_value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    }, Some("""
      WITH base AS (SELECT l_orderkey, l_linenumber,
                           CAST(l_quantity AS DOUBLE) AS quantity,
                           CAST(l_extendedprice AS DOUBLE) AS extendedprice,
                           CAST(l_discount AS DOUBLE) AS discount
                    FROM lineitem WHERE l_orderkey < 3000)
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
             quantity AS metric_value FROM base
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', extendedprice FROM base
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', discount FROM base
      ORDER BY l_orderkey, l_linenumber, metric""")),

    // Pearson correlation from exact moment sums: the built-in corr()
    // accumulates doubles in partition order (not reproducible), so the
    // moments are summed in DECIMAL (order-free) and the final formula is
    // the identical double operation tree in both engines (sqrt is
    // IEEE-correctly-rounded, unlike log).
    QueryDef("stats_corr", (s, dir) => {
      val x = col("value")
      val y = col("user_id").cast("double")
      val agged = t("events")(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(x.cast("decimal(18,4)")).cast("double").as("sx"),
          sum(y.cast("decimal(18,4)")).cast("double").as("sy"),
          sum((x * x).cast("decimal(28,8)")).cast("double").as("sxx"),
          sum((y * y).cast("decimal(28,8)")).cast("double").as("syy"),
          sum((x * y).cast("decimal(28,8)")).cast("double").as("sxy"))
      agged.select(col("event_type"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr_xy"))
        .orderBy(col("event_type"))
    }, Some("""
      WITH m AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               -- moment sums DECIMAL→VARCHAR→DOUBLE: DuckDB's direct
               -- decimal→double cast drifts 1 ulp past 2^53 unscaled
               -- units (stats_regr_line at sf1.0); strtod is correctly
               -- rounded like Spark's Decimal.toDouble
               CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(sum(CAST(CAST(user_id AS DOUBLE) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(sum(CAST(value * value AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(sum(CAST(CAST(user_id AS DOUBLE) * CAST(user_id AS DOUBLE)
                             AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(sum(CAST(value * CAST(user_id AS DOUBLE) AS DECIMAL(28,8))) AS VARCHAR) AS DOUBLE) AS sxy
        FROM events GROUP BY event_type)
      SELECT event_type, n,
             (n * sxy - sx * sy) /
               (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xy
      FROM m ORDER BY event_type""")),

    // Sliding windows (1 h window, 30 min slide) — batch form of the
    // streaming sliding aggregation. Each event lands in exactly two
    // windows (floor-to-slide and one slide earlier); the oracle unnests
    // both starts per row. DECIMAL sums keep the per-window totals exact.
    QueryDef("stream_window_slide", (s, dir) => {
      t("events")(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
        .select(col("window.start").cast("timestamp_ntz").as("window_start"),
          col("n_events"), col("total_value"))
        .orderBy(col("window_start"))
    }, Some("""
      WITH starts AS (
        SELECT unnest([
                 epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000 * 1800000000,
                 epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000 * 1800000000
                   - 1800000000
               ]) AS s_us, value
        FROM events)
      SELECT make_timestamp(s_us) AS window_start,
             count(*) AS n_events,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM starts GROUP BY 1 ORDER BY 1""")),

    // Stratified deterministic sampling: event-type-dependent keep rates
    // (keep purchases at 60%, clicks at 25%, the rest at 5%).
    QueryDef("sample_stratified", (s, dir) => {
      Sampling.stratifiedHashSample(
          t("events")(s, dir).select(col("event_id"), col("event_type")),
          "event_id", "event_type",
          pct = Map("purchase" -> 60, "click" -> 25), defaultPct = 5)
        .orderBy(col("event_id"))
    }, Some("""
      SELECT event_id, event_type FROM events
      WHERE CAST(concat('0x', substr(md5(event_type || ':' ||
                   CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
            < CASE event_type WHEN 'purchase' THEN 60
                              WHEN 'click' THEN 25 ELSE 5 END
      ORDER BY event_id"""))
  )
}
