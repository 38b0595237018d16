package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysisFns
import graft.operators.{Layout, Validate}

/** Round-6 validation/layout wave: declarative data-contract validation
  * (the pre-ingest quality gate), batch time-window dedup, positional-
  * postings phrase search, and a z-order clustering audit. All exact —
  * integer counts and bit arithmetic only.
  */
object ValidationWaveQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** Orders rows with normalized (x, y) dims, Morton z, and the level-2
    * curve-quadrant bucket (top four z bits) — shared by the clustering
    * audit and the pruning simulation. Bounds come from ONE broadcast
    * 1-row aggregate; everything else is pure projection.
    */
  private[graft] def zBuckets(o: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val keys = o.select(col("o_custkey"), col("o_orderkey"))
    val bounds = keys.agg(
      min(col("o_custkey")).as("mnx"), max(col("o_custkey")).as("mxx"),
      min(col("o_orderkey")).as("mny"), max(col("o_orderkey")).as("mxy"))
    keys.crossJoin(broadcast(bounds))
      .select(
        Layout.normalize(col("o_custkey"), col("mnx"), col("mxx")).as("x"),
        Layout.normalize(col("o_orderkey"), col("mny"), col("mxy")).as("y"))
      .withColumn("z", Layout.interleave(Seq(col("x"), col("y"))))
      .withColumn("bucket", expr("z DIV 268435456"))
  }

  /** DuckDB mirror of [[graft.operators.Layout.normalize]] — identical
    * IEEE op sequence: (c − min) / span FIRST, then × 65535, then floor.
    */
  private[graft] def sqlNorm(c: String, mn: String, mx: String): String =
    s"""CASE WHEN CAST($mx AS DOUBLE) - CAST($mn AS DOUBLE) <= 0.0 THEN 0
        ELSE least(65535, CAST(floor(
          (CAST($c AS DOUBLE) - CAST($mn AS DOUBLE))
            / (CAST($mx AS DOUBLE) - CAST($mn AS DOUBLE)) * 65535)
          AS BIGINT)) END"""

  /** DuckDB CTE chain producing (x, y, bucket) for orders — the mirror
    * of [[zBuckets]].
    */
  private[graft] val sqlZBuckets: String = s"""
      b AS (
        SELECT min(o_custkey) AS mnx, max(o_custkey) AS mxx,
               min(o_orderkey) AS mny, max(o_orderkey) AS mxy
        FROM orders),
      d AS (
        SELECT ${sqlNorm("o_custkey", "mnx", "mxx")} AS x,
               ${sqlNorm("o_orderkey", "mny", "mxy")} AS y
        FROM orders CROSS JOIN b),
      zb AS (
        SELECT x, y,
               CAST(list_sum(list_transform(generate_series(0, 15), bb ->
                 (((x >> bb) & 1) << (2*bb)) + (((y >> bb) & 1) << (2*bb + 1))))
                 AS BIGINT) // 268435456 AS bucket
        FROM d)"""

  val defs: Seq[QueryDef] = Seq(

    // Data-contract validation over orders: four row-local rules fold
    // into ONE aggregate pass (per-rule sum(when) columns of the same
    // agg — rule count never adds scans), uniqueness is one distinct
    // aggregate, referential integrity one broadcast anti-join. The
    // report is additive because value rules ignore nulls (a null fails
    // only not_null). This is the Deequ-check shape: at 100 TB the whole
    // suite costs one fact scan + one key shuffle.
    QueryDef("validate_contracts", (s, dir) => {
      val o = t("orders")(s, dir)
      val rowLocal = Validate.check(o, Seq(
        Validate.notNull("o_custkey"),
        Validate.inSet("o_orderstatus", Seq("O", "F", "P")),
        Validate.inRange("o_totalprice", 0, 1000000),
        Validate.matches("o_orderpriority", "^[1-5]-")))
      val unique = Validate.checkUnique(o, Seq("o_orderkey"))
      val ref = Validate.checkReferential(
        o, "o_custkey", t("customer")(s, dir), "c_custkey")
      rowLocal.unionByName(unique).unionByName(ref)
        .orderBy(col("rule"))
    }, Some("""
      WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
      SELECT rule, violations, n_rows FROM (
        SELECT 'not_null(o_custkey)' AS rule,
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS violations
        FROM orders
        UNION ALL
        SELECT 'in_set(o_orderstatus)',
               CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('O','F','P')
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'in_range(o_totalprice)',
               CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                              AND NOT (o_totalprice BETWEEN 0 AND 1000000)
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'matches(o_orderpriority)',
               CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                              AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'unique(o_orderkey)',
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'referential(o_custkey->c_custkey)',
               CAST(count(*) AS BIGINT)
        FROM orders o
        WHERE o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
      CROSS JOIN n ORDER BY rule""")),

    // Batch time-window dedup: within each (user, event_type, hour)
    // tumbling window keep the EARLIEST event — the batch twin of the
    // streaming dropDuplicates-within-watermark. One hash shuffle on the
    // composite key; the per-key window never sees more than one
    // window's rows. Ties break on event_id, so the keeper is unique.
    QueryDef("dedup_time_window", (s, dir) => {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"), col("hour"))
        .orderBy(col("ts"), col("event_id"))
      t("events")(s, dir)
        .withColumn("hour", date_trunc("hour", col("ts")))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("hour"), col("user_id"), col("event_type"),
          col("event_id"))
        .orderBy(col("hour"), col("user_id"), col("event_type"))
    }, Some("""
      SELECT date_trunc('hour', ts) AS hour, user_id, event_type, event_id
      FROM events
      QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type, date_trunc('hour', ts)
        ORDER BY ts, event_id) = 1
      ORDER BY hour, user_id, event_type""")),

    // Phrase search over positional postings: docs containing the exact
    // phrase "the data", found by equi-joining the two terms' postings
    // on (doc, pos+1). Scale shape: an array_contains PRE-FILTER keeps
    // docs lacking either word out of the explode entirely (the posting
    // build is the expensive step — never explode what can't match);
    // the join keys are (doc_id, pos), so candidates are exact, never
    // scored. The oracle takes the direct adjacent-scan route — matching
    // hashes prove postings ≡ scan.
    QueryDef("text_phrase_search", (s, dir) => {
      val Seq(w1, w2) = Seq("the", "data")
      val toks = t("documents")(s, dir)
        .select(col("doc_id"), TextAnalysisFns.tokens(col("text")).as("ts"))
        .where(array_contains(col("ts"), w1) && array_contains(col("ts"), w2))
      val postings = toks.select(col("doc_id"),
        posexplode(col("ts")).as(Seq("pos", "term")))
      val p1 = postings.where(col("term") === w1)
        .select(col("doc_id"), col("pos"))
      val p2 = postings.where(col("term") === w2)
        .select(col("doc_id").as("doc_id2"), col("pos").as("pos2"))
      p1.join(p2, col("doc_id") === col("doc_id2") &&
          col("pos2") === col("pos") + 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
        .orderBy(col("doc_id"))
    }, Some(s"""
      WITH toks AS (
        SELECT doc_id, ${Sql.tokens("text")} AS ts FROM documents),
      hits AS (
        SELECT doc_id,
               list_filter(generate_series(1, len(ts) - 1),
                 i -> ts[i] = 'the' AND ts[i+1] = 'data') AS at
        FROM toks)
      SELECT doc_id, CAST(len(at) AS BIGINT) AS n_hits,
             CAST(list_min(at) - 1 AS INT) AS first_pos
      FROM hits WHERE len(at) > 0 ORDER BY doc_id""")),

    // Join-key skew profile — the pre-join diagnostic that decides
    // whether a key needs salting or AQE skew handling BEFORE the 100 TB
    // shuffle runs: per-key counts collapse map-side, then the tiny
    // per-key histogram yields total, distinct keys, max key count, the
    // top key's share (one division of exact BIGINTs) and the count at
    // the p99 key (the percentile_mode cross-multiplied threshold on
    // the count-of-counts grid). Everything downstream of the first
    // aggregate runs on |distinct keys| rows.
    QueryDef("profile_key_skew", (s, dir) => {
      val keyCnt = t("lineitem")(s, dir)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      val grid = keyCnt.groupBy(col("cnt")).agg(count(lit(1)).as("nk"))
      val cum = grid
        .withColumn("shard", expr("cnt DIV 256"))
        .withColumn("icum", sum(col("nk")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("shard")).orderBy(col("cnt"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)))
      val stot = cum.groupBy(col("shard")).agg(sum(col("nk")).as("snk"))
      val off = stot.as("a")
        .join(broadcast(stot.as("b")), col("b.shard") < col("a.shard"), "left")
        .groupBy(col("a.shard").as("shard"))
        .agg(coalesce(sum(col("b.snk")), lit(0L)).as("off"))
      val withCum = cum.join(broadcast(off), Seq("shard"))
        .select(col("cnt"), (col("icum") + col("off")).as("ccum"))
      val tot = keyCnt.agg(sum(col("cnt")).as("n"),
        count(lit(1)).as("n_keys"), max(col("cnt")).as("max_cnt"))
      withCum.crossJoin(broadcast(tot))
        .agg(
          max(col("n")).as("n_rows"),
          max(col("n_keys")).as("n_keys"),
          max(col("max_cnt")).as("max_key_cnt"),
          min(when(col("ccum") * 100 >= col("n_keys") * 99, col("cnt")))
            .as("p99_key_cnt"))
        .select(col("n_rows"), col("n_keys"), col("max_key_cnt"),
          col("p99_key_cnt"),
          (col("max_key_cnt").cast("double") / col("n_rows"))
            .as("top_key_share"))
    }, Some("""
      WITH kc AS (
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1),
      g AS (SELECT cnt, CAST(count(*) AS BIGINT) AS nk FROM kc GROUP BY 1),
      w AS (SELECT cnt, CAST(sum(nk) OVER (ORDER BY cnt) AS BIGINT) AS ccum
            FROM g),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_keys,
                   CAST(max(cnt) AS BIGINT) AS max_cnt
            FROM kc)
      SELECT t.n_rows, t.n_keys, t.max_cnt AS max_key_cnt,
             (SELECT min(cnt) FROM w
              WHERE ccum * 100 >= t.n_keys * 99) AS p99_key_cnt,
             CAST(t.max_cnt AS DOUBLE) / t.n_rows AS top_key_share
      FROM t""")),

    // Z-order clustering audit: Morton-interleave two 16-bit dimensions
    // of orders, bucket rows by the z-value's TOP FOUR BITS (the
    // level-2 quadrants of the curve — a pure projection, no global
    // window, no extra shuffle), and report each bucket's row count and
    // per-dimension min/max envelope. Tight envelopes are exactly what
    // parquet min/max stats need for multi-dimension scan pruning — the
    // audit a layout job runs to prove its clustering worked. The
    // oracle recomputes the interleave bit-for-bit.
    QueryDef("layout_zorder_stats", (s, dir) =>
      zBuckets(t("orders")(s, dir))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("bucket"))
    , Some(s"""
      WITH $sqlZBuckets
      SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM zb GROUP BY 1 ORDER BY bucket""")),

    // Metadata-pruning simulation — the CONSUMER side of the z-order
    // stats: given the per-bucket min/max envelopes (the stand-in for
    // parquet file/row-group stats) and a range predicate on x, decide
    // per bucket whether its envelope can overlap, and report scanned
    // vs pruned buckets and rows. The output carries BOTH
    // rows_matched (full-scan truth) and rows_matched_scanned (matches
    // inside scanned buckets) — their equality in the hash-checked
    // result IS the soundness proof that envelope pruning loses no
    // rows. The decision runs on the |buckets|-row stats table; at
    // 100 TB this is the scan-100-GB-instead path.
    QueryDef("layout_prune_sim", (s, dir) => {
      val rows = zBuckets(t("orders")(s, dir)).cache()
      val (lo, hi) = (10000L, 30000L)
      val stats = rows.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"))
        .withColumn("scanned", !(col("max_x") < lo || col("min_x") > hi))
      val bucketTotals = stats.agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("scanned"), 1L).otherwise(0L)).as("n_scanned"),
        sum(col("n")).as("rows_total"),
        sum(when(col("scanned"), col("n")).otherwise(0L)).as("rows_scanned"))
      val matched = rows
        .join(broadcast(stats.select(col("bucket"), col("scanned"))),
          Seq("bucket"))
        .agg(
          sum(when(col("x").between(lo, hi), 1L).otherwise(0L))
            .as("rows_matched"),
          sum(when(col("x").between(lo, hi) && col("scanned"), 1L)
            .otherwise(0L)).as("rows_matched_scanned"))
      bucketTotals.crossJoin(matched)
    }, Some(s"""
      WITH $sqlZBuckets,
      st AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               min(x) AS min_x, max(x) AS max_x
        FROM zb GROUP BY 1),
      dec AS (
        SELECT *, NOT (max_x < 10000 OR min_x > 30000) AS scanned FROM st),
      bt AS (
        SELECT CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_scanned,
               CAST(sum(n) AS BIGINT) AS rows_total,
               CAST(sum(CASE WHEN scanned THEN n ELSE 0 END) AS BIGINT)
                 AS rows_scanned
        FROM dec),
      m AS (
        SELECT
          CAST(sum(CASE WHEN x BETWEEN 10000 AND 30000 THEN 1 ELSE 0 END)
            AS BIGINT) AS rows_matched,
          CAST(sum(CASE WHEN x BETWEEN 10000 AND 30000 AND d.scanned
                        THEN 1 ELSE 0 END) AS BIGINT) AS rows_matched_scanned
        FROM zb JOIN dec d USING (bucket))
      SELECT * FROM bt CROSS JOIN m"""))
  )
}
