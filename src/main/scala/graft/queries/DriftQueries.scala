package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-drift monitoring — the gate a 100 TB ingest pipeline runs BEFORE
  * letting a new batch into the training corpus: distribution distance
  * between the incoming slice and the reference slice. Both statistics
  * are deliberately integer-exact until one final IEEE division, so the
  * DuckDB oracle hash-matches bit-for-bit with no libm in sight:
  * cross-multiplied counts replace per-term divisions (the same trick the
  * repo's threshold predicates use), and ln-based measures (PSI, KL) are
  * intentionally absent — their libm last-ulp behavior is not portable
  * across engines.
  */
object DriftQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** Leading decimal digit of a positive long column (by name, so the
    * division is the SQL integer `DIV` — Spark's Column `/` on longs is
    * double division) — a full 18-decade CASE chain, so ANY representable
    * value keeps a single-digit lead (a truncated chain emits 10..99
    * beyond its last band: counted in n but landing in no digit bucket,
    * silently distorting the Benford TV).
    */
  def leadingDigit(colName: String): org.apache.spark.sql.Column = {
    val m = col(colName)
    (1 to 17).foldLeft(when(m < 10L, m)) { case (acc, p) =>
      acc.when(m < math.pow(10, p + 1).toLong,
        expr(s"$colName DIV ${math.pow(10, p).toLong}"))
    }.otherwise(expr(s"$colName DIV ${1000000000000000000L}"))
  }

  /** Week-over-week total-variation distance between per-week `event_type`
    * distributions: TV = ½·Σ|p_i − q_i| computed as
    * Σ|c_cur·n_prev − c_prev·n_cur| / (2·n_cur·n_prev) — the numerator is
    * an exact BIGINT sum (no per-category division), the final division
    * ONE double op. Scale: two grouped counts + an equi-join on
    * (week, event_type) — shuffle keys are (weeks × types), never rows.
    */
  def tvWeekly(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wk = events
      .select(date_trunc("week", col("ts")).cast("date").as("week"),
        col("event_type"))
      .groupBy(col("week"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val tot = wk.groupBy(col("week")).agg(sum(col("c")).as("n"))
    val prev = wk.select(date_add(col("week"), 7).as("week"),
      col("event_type"), col("c").as("c_prev"))
    val pair = wk.alias("c").join(prev.alias("p"),
        col("c.week") === col("p.week") &&
          col("c.event_type") === col("p.event_type"), "full_outer")
      .select(coalesce(col("c.week"), col("p.week")).as("week"),
        coalesce(col("c.c"), lit(0L)).as("c_cur"),
        coalesce(col("p.c_prev"), lit(0L)).as("c_prev"))
    // LEFT join to the current-week totals (n_cur defaults to 0): a feed
    // that vanishes entirely — prior-week events, zero current events —
    // is the MOST extreme drift and must report tv = 1.0, not silently
    // drop out of the monitor. The week axis therefore comes from the
    // union of current and shifted-previous weeks (`pair` is already a
    // full outer on (week, event_type)); only a week with no PRIOR week
    // (the first week of data — nothing to drift from) is excluded, by
    // the inner join to the shifted totals. When n_cur = 0 the integer
    // numerator degenerates to 0, so tv is pinned to 1.0 explicitly (TV
    // between a distribution and the empty measure, by convention).
    pair
      .join(tot.select(col("week"), col("n").as("n_cur")), Seq("week"),
        "left_outer")
      .join(broadcast(tot.select(date_add(col("week"), 7).as("week"),
        col("n").as("n_prev"))), Seq("week"))
      .select(col("week"), col("c_cur"), col("c_prev"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"), col("n_prev"))
      .groupBy(col("week"), col("n_prev"), col("n_cur"))
      .agg(sum(abs(col("c_cur") * col("n_prev") - col("c_prev") * col("n_cur")))
        .as("tv_num"))
      .select(col("week").cast("timestamp").as("week"),
        col("n_prev"), col("n_cur"), col("tv_num"),
        when(col("n_cur") === 0L, lit(1.0)).otherwise(
          col("tv_num").cast("double") /
            (lit(2L) * col("n_cur") * col("n_prev")).cast("double")).as("tv"))
      .orderBy(col("week"))
  }

  /** Shared two-sample machinery: 0.01-width bins of `value` (even vs odd
    * `event_id` halves), per-bin counts, exact cumulative counts in bin
    * order, and the half totals — everything KS and the decile Q–Q table
    * need, all BIGINT-exact.
    */
  private def binnedCum(events: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val binned = events
      .select(floor(col("value") * lit(100.0)).cast("long").as("bin"),
        when(col("event_id") % 2 === 0, 1L).otherwise(0L).as("a"))
    val perBin = binned.groupBy(col("bin"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val cumW = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perBin
      .withColumn("cuma", sum(col("ca")).over(cumW))
      .withColumn("cumb", sum(col("cb")).over(cumW))
    val tots = perBin.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    (cum, tots)
  }

  /** Two-sample Kolmogorov–Smirnov drift on `value` (even vs odd
    * `event_id` halves) over fixed 0.01-width bins — see the QueryDef
    * comment below for the exactness and bounded-bins scale argument.
    */
  def ksValue(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val (cum, tots) = binnedCum(events)
    cum.crossJoin(broadcast(tots))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")))
        .as("ks_num"))
      .select(col("n_a"), col("n_b"), col("ks_num"),
        (col("ks_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("ks"))
  }

  /** Decile Q–Q drift table on `value`: for each decile d ∈ 1..9, the
    * EXACT d-th decile bin of each half — the smallest bin whose
    * cumulative count clears the cross-multiplied threshold
    * `cum·10 ≥ d·n` (no division, no percentile interpolation — the same
    * trick as profile_key_skew's p99) — plus the per-decile bin gap. A
    * drifted tail shows up as a growing gap in the outer deciles even
    * when KS (one max) stays flat. All integers end to end.
    */
  def decileBounds(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val (cum, tots) = binnedCum(events)
    val deciles = events.sparkSession.range(1, 10)
      .select(col("id").as("decile"))
    cum.crossJoin(broadcast(tots)).crossJoin(broadcast(deciles))
      .groupBy(col("decile"))
      .agg(
        min(when(col("cuma") * 10 >= col("decile") * col("n_a"), col("bin")))
          .as("bound_a"),
        min(when(col("cumb") * 10 >= col("decile") * col("n_b"), col("bin")))
          .as("bound_b"))
      .select(col("decile"), col("bound_a"), col("bound_b"),
        (col("bound_b") - col("bound_a")).as("gap"))
      .orderBy(col("decile"))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("drift_tv_weekly", (s, dir) => tvWeekly(t("events")(s, dir)),
      Some("""
      WITH wk AS (
        SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
               event_type, count(*) AS c
        FROM events GROUP BY 1, 2),
      tot AS (SELECT week, CAST(sum(c) AS BIGINT) AS n FROM wk GROUP BY week),
      pair AS (
        SELECT coalesce(c.week, p.week) AS week,
               coalesce(c.c, 0) AS c_cur,
               coalesce(p.c_prev, 0) AS c_prev
        FROM wk c
        FULL OUTER JOIN (SELECT week + 7 AS week, event_type, c AS c_prev FROM wk) p
          ON c.week = p.week AND c.event_type = p.event_type),
      agg AS (
        SELECT pair.week, tp.n AS n_prev,
               CAST(coalesce(tc.n, 0) AS BIGINT) AS n_cur,
               CAST(sum(abs(c_cur * tp.n - c_prev * coalesce(tc.n, 0)))
                 AS BIGINT) AS tv_num
        FROM pair
        LEFT JOIN tot tc ON tc.week = pair.week
        JOIN tot tp ON tp.week + 7 = pair.week
        GROUP BY pair.week, tp.n, tc.n)
      SELECT CAST(week AS TIMESTAMP) AS week, n_prev, n_cur, tv_num,
             CASE WHEN n_cur = 0 THEN 1.0
                  ELSE CAST(tv_num AS DOUBLE) /
                       CAST(2 * n_cur * n_prev AS DOUBLE) END AS tv
      FROM agg ORDER BY week""")),

    // Two-sample Kolmogorov–Smirnov drift on `value`, even vs odd
    // event_id halves, over fixed 0.01-width bins (floor(value·100) — a
    // single IEEE multiply + exact floor in both engines). KS is the max
    // CDF gap evaluated at bin boundaries: max|cumA·nB − cumB·nA| in
    // exact integers, divided ONCE by nA·nB. Scale: the cumulative
    // window runs over DISTINCT BINS — bounded by the metric's range
    // (≤49k keys here) no matter how many rows feed it, so the
    // single-partition cumsum stays trivial at any corpus size.
    QueryDef("drift_ks_value", (s, dir) => ksValue(t("events")(s, dir)),
      Some("""
      WITH b AS (
        SELECT CAST(floor(value * 100) AS BIGINT) AS bin,
               CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a
        FROM events),
      c AS (SELECT bin, CAST(sum(a) AS BIGINT) AS ca,
                   CAST(sum(1 - a) AS BIGINT) AS cb
            FROM b GROUP BY bin),
      cum AS (
        SELECT bin,
               CAST(sum(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
               CAST(sum(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
        FROM c),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM c)
      SELECT t.n_a, t.n_b,
             CAST(max(abs(cuma * t.n_b - cumb * t.n_a)) AS BIGINT) AS ks_num,
             CAST(max(abs(cuma * t.n_b - cumb * t.n_a)) AS DOUBLE)
               / CAST(t.n_a * t.n_b AS DOUBLE) AS ks
      FROM cum, t GROUP BY t.n_a, t.n_b""")),

    // Benford first-digit conformance per event_type: TV distance between
    // the leading-digit distribution of `value` and Benford's law — the
    // classic synthetic-data / fabricated-numbers alarm. The Benford
    // probabilities log₁₀(1+1/d) are computed ONCE in Scala and embedded
    // as shortest-roundtrip double literals in BOTH engines (the same
    // trick as the LSH plane literals), so no engine ever calls log.
    // Leading digit comes from floor(value·100) via a fixed integer CASE
    // chain (floor preserves the leading digit for x ≥ 1) — no log10, no
    // string formatting. Per-digit counts are conditional sums in ONE
    // aggregate row; the 9 |c_d − p_d·n| terms fold in fixed order.
    QueryDef("drift_benford_firstdigit", (s, dir) => {
      val pd = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
      val m = floor(col("value") * lit(100.0)).cast("long")
      val base = t("events")(s, dir)
        .where(col("value") >= 0.01)
        .withColumn("__m", m)
        .select(col("event_type"), leadingDigit("__m").as("d"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          (1 to 9).map(d =>
            sum(when(col("d") === d.toLong, 1L).otherwise(0L))
              .cast("double").as(s"c$d")): _*)
      val tv = (1 to 9).map(d => abs(col(s"c$d") - lit(pd(d - 1)) * col("n")))
        .reduce(_ + _) / (lit(2.0) * col("n"))
      base.select(col("event_type"), col("n").cast("long").as("n"),
          tv.as("tv_benford"))
        .orderBy(col("event_type"))
    }, Some {
      val pd = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))
      // same 18-decade chain as the Spark side — generated from one loop
      // so the band lists can never drift apart
      val lead = "CASE WHEN m < 10 THEN m " +
        (1 to 17).map(p =>
          s"WHEN m < ${math.pow(10, p + 1).toLong} THEN m // ${math.pow(10, p).toLong}")
          .mkString(" ") +
        s" ELSE m // ${1000000000000000000L} END"
      // e0 suffix forces DuckDB to parse the literal DIRECTLY as a double
      // (correctly-rounded strtod); a bare decimal literal goes through
      // DECIMAL first, whose cast to double can be off by one ulp
      val terms = (1 to 9).map(d =>
        s"abs(c$d - ${pd(d - 1)}e0 * n)").mkString(" + ")
      val cs = (1 to 9).map(d =>
        s"CAST(sum(CASE WHEN d = $d THEN 1 ELSE 0 END) AS DOUBLE) AS c$d").mkString(", ")
      s"""
      WITH b AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS m
        FROM events WHERE value >= 0.01),
      l AS (SELECT event_type, $lead AS d FROM b),
      a AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n, $cs
            FROM l GROUP BY event_type)
      SELECT event_type, CAST(n AS BIGINT) AS n,
             ($terms) / (CAST(2.0 AS DOUBLE) * n) AS tv_benford
      FROM a ORDER BY event_type"""
    }),

    // Burstiness (Fano factor) of hourly event counts per type:
    // variance-to-mean ratio of the per-hour counts — F ≈ 1 is Poisson
    // (steady), F ≫ 1 is bursty (needs bigger micro-batch headroom).
    // Population variance over the k hourly counts via integer raw sums:
    // F = (k·Σx² − S²) / (k·S) — exact BIGINTs, ONE double division.
    QueryDef("burstiness_fano", (s, dir) => {
      val hourly = t("events")(s, dir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("x"))
      hourly.groupBy(col("event_type"))
        .agg(count(lit(1)).as("k"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("sx2"))
        .select(col("event_type"), col("k"), col("s"),
          ((col("k") * col("sx2") - col("s") * col("s")).cast("double") /
            (col("k") * col("s")).cast("double")).as("fano"))
        .orderBy(col("event_type"))
    }, Some("""
      WITH h AS (
        SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
      a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(x) AS BIGINT) AS s,
                   CAST(sum(x * x) AS BIGINT) AS sx2
            FROM h GROUP BY event_type)
      SELECT event_type, k, s,
             CAST(k * sx2 - s * s AS DOUBLE) / CAST(k * s AS DOUBLE) AS fano
      FROM a ORDER BY event_type""")),

    // Inter-arrival-time quartiles per event type — the traffic-shape
    // profile (bursty vs steady feeds need different micro-batch sizing).
    // Gaps are exact integer MICROSECONDS from a per-user lag; quartiles
    // ride the proven percentile ≡ quantile_cont bit-exactness on
    // integer-valued doubles at quarter fractions (text_token_quantiles).
    QueryDef("interarrival_quartiles", (s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      t("events")(s, dir)
        .withColumn("__prev", lag(col("ts"), 1).over(w))
        .where(col("__prev").isNotNull)
        .select(col("event_type"),
          (unix_micros(col("ts")) - unix_micros(col("__prev")))
            .cast("double").as("gap_us"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(gap_us, 0.25D)").as("p25"),
          expr("percentile(gap_us, 0.5D)").as("p50"),
          expr("percentile(gap_us, 0.75D)").as("p75"),
          count(lit(1)).as("n_gaps"))
        .orderBy(col("event_type"))
    }, Some("""
      WITH o AS (
        SELECT event_type,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) -
                    epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER
                      (PARTITION BY user_id, event_type
                       ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS DOUBLE) AS gap_us
        FROM events),
      g AS (SELECT event_type, gap_us FROM o WHERE gap_us IS NOT NULL)
      SELECT event_type, quantile_cont(gap_us, 0.25) AS p25,
             quantile_cont(gap_us, 0.5) AS p50,
             quantile_cont(gap_us, 0.75) AS p75,
             count(*) AS n_gaps
      FROM g GROUP BY event_type ORDER BY event_type""")),

    // Seasonality drift: TV distance between the hour-of-day activity
    // profiles of weekdays vs weekends — the load-shape check behind
    // "can we batch tonight". Day-set membership uses EACH ENGINE'S OWN
    // dow convention for the same day set (Spark dayofweek 1=Sun/7=Sat,
    // DuckDB isodow 6/7 — the hash pins equivalence); the 24-hour grid
    // is bounded, the numerator exact BIGINT.
    QueryDef("drift_hour_seasonality", (s, dir) => {
      val perHour = t("events")(s, dir)
        .select(hour(col("ts")).cast("long").as("h"),
          when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L).as("we"))
        .groupBy(col("h"))
        .agg(sum(lit(1L) - col("we")).as("ca"), sum(col("we")).as("cb"))
      val tots = perHour.agg(sum(col("ca")).as("n_weekday"),
        sum(col("cb")).as("n_weekend"))
      perHour.crossJoin(broadcast(tots))
        .groupBy(col("n_weekday"), col("n_weekend"))
        .agg(sum(abs(col("ca") * col("n_weekend") - col("cb") * col("n_weekday")))
          .as("tv_num"))
        .select(col("n_weekday"), col("n_weekend"), col("tv_num"),
          (col("tv_num").cast("double") /
            (lit(2L) * col("n_weekday") * col("n_weekend")).cast("double"))
            .as("tv"))
    }, Some("""
      WITH b AS (
        SELECT CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
               CASE WHEN isodow(CAST(ts AS TIMESTAMP)) IN (6, 7) THEN 1 ELSE 0 END AS we
        FROM events),
      ph AS (SELECT h, CAST(sum(1 - we) AS BIGINT) AS ca,
                    CAST(sum(we) AS BIGINT) AS cb
             FROM b GROUP BY h),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_weekday,
                   CAST(sum(cb) AS BIGINT) AS n_weekend FROM ph)
      SELECT t.n_weekday, t.n_weekend,
             CAST(sum(abs(ca * t.n_weekend - cb * t.n_weekday)) AS BIGINT) AS tv_num,
             CAST(sum(abs(ca * t.n_weekend - cb * t.n_weekday)) AS DOUBLE)
               / CAST(2 * t.n_weekday * t.n_weekend AS DOUBLE) AS tv
      FROM ph CROSS JOIN t GROUP BY t.n_weekday, t.n_weekend""")),

    // Novel-category influx: per week, the share of events whose
    // event_type is seen for the FIRST time that week — the "new domain
    // arriving" alarm. first_seen = min(week) per type, joined back;
    // novel_share is the one final division. Scale: shuffle keys are
    // types and weeks, never rows.
    QueryDef("drift_novel_types", (s, dir) => {
      val wk = t("events")(s, dir)
        .select(date_trunc("week", col("ts")).cast("date").as("week"),
          col("event_type"))
        .groupBy(col("week"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val firstSeen = wk.groupBy(col("event_type"))
        .agg(min(col("week")).as("fweek"))
      wk.join(broadcast(firstSeen), Seq("event_type"))
        .groupBy(col("week"))
        .agg(sum(col("c")).as("n"),
          sum(when(col("fweek") === col("week"), col("c")).otherwise(0L))
            .as("novel_rows"),
          sum(when(col("fweek") === col("week"), 1L).otherwise(0L))
            .as("novel_types"))
        .select(col("week").cast("timestamp").as("week"), col("n"),
          col("novel_types"), col("novel_rows"),
          (col("novel_rows").cast("double") / col("n").cast("double"))
            .as("novel_share"))
        .orderBy(col("week"))
    }, Some("""
      WITH wk AS (
        SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
               event_type, count(*) AS c
        FROM events GROUP BY 1, 2),
      fs AS (SELECT event_type, min(week) AS fweek FROM wk GROUP BY 1)
      SELECT CAST(wk.week AS TIMESTAMP) AS week,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CASE WHEN fs.fweek = wk.week THEN 1 ELSE 0 END) AS BIGINT) AS novel_types,
             CAST(sum(CASE WHEN fs.fweek = wk.week THEN c ELSE 0 END) AS BIGINT) AS novel_rows,
             CAST(sum(CASE WHEN fs.fweek = wk.week THEN c ELSE 0 END) AS DOUBLE)
               / CAST(sum(c) AS DOUBLE) AS novel_share
      FROM wk JOIN fs USING (event_type)
      GROUP BY wk.week ORDER BY week""")),

    // Vocabulary-growth (Heaps) curve over ingestion order: each word
    // 3-shingle's first-seen 20-doc batch → new-type count per batch →
    // cumulative vocabulary size. The corpus-health curve a pipeline
    // plots to see returns-per-added-data flattening (shingles, not bare
    // tokens: the synthetic corpus has only ~31 distinct words, so the
    // combinatorial unit is what actually grows). Scale: explode → min
    // per shingle (one shuffle on the shingle key); the batch axis grows
    // with the corpus (N/20 rows), so the prefix sum is SHARDED — 256
    // batches per shard, per-shard windows plus a broadcast offset join
    // (the same distributed-cumsum shape as profile_key_skew) — never a
    // single-partition sort of the whole axis.
    QueryDef("vocab_growth", (s, dir) => {
      val firstSeen = t("documents")(s, dir)
        .select(expr("doc_id DIV 20").as("batch"),
          explode(graft.functions.SimFns.wordShingles(
            graft.functions.TextAnalysisFns.tokens(col("text")), 3)).as("tok"))
        .groupBy(col("tok")).agg(min(col("batch")).as("fbatch"))
      val perBatch = firstSeen.groupBy(col("fbatch").as("batch"))
        .agg(count(lit(1)).as("new_types"))
        .withColumn("shard", expr("batch DIV 256"))
      val shardW = Window.partitionBy(col("shard")).orderBy(col("batch"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val icum = perBatch.withColumn("icum", sum(col("new_types")).over(shardW))
      val stot = perBatch.groupBy(col("shard")).agg(sum(col("new_types")).as("snk"))
      val off = stot.as("a")
        .join(broadcast(stot.as("b")), col("b.shard") < col("a.shard"), "left")
        .groupBy(col("a.shard").as("shard"))
        .agg(coalesce(sum(col("b.snk")), lit(0L)).as("off"))
      icum.join(broadcast(off), Seq("shard"))
        .select(col("batch"), col("new_types"),
          (col("icum") + col("off")).as("vocab"))
        .orderBy(col("batch"))
    }, Some {
      val toks = Sql.tokens("text")
      s"""
      WITH tk AS (
        SELECT doc_id // 20 AS batch,
               unnest(${Sql.wordShingles(toks, 3)}) AS tok
        FROM documents),
      fs AS (SELECT tok, min(batch) AS batch FROM tk GROUP BY tok),
      pb AS (SELECT batch, count(*) AS new_types FROM fs GROUP BY batch)
      SELECT batch, new_types,
             CAST(sum(new_types) OVER (ORDER BY batch ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab
      FROM pb ORDER BY batch"""
    }),

    // Per-source language-mix drift: TV distance between each ingest
    // source's lang distribution and the GLOBAL lang distribution — the
    // "which source is skewed" report. The (source × lang) grid is built
    // explicitly (a source MISSING a language still pays that language's
    // full reference mass); numerator Σ|c·N − g_l·n_s| exact BIGINT, one
    // final division. Scale: grid is |sources|×|langs| — broadcast-sized
    // by construction.
    QueryDef("drift_source_lang_tv", (s, dir) => {
      val sl = t("documents")(s, dir)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      val st = sl.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
      val gl = sl.groupBy(col("lang")).agg(sum(col("c")).as("g"))
      val gt = sl.agg(sum(col("c")).as("n"))
      st.crossJoin(broadcast(gl)).crossJoin(broadcast(gt))
        .join(sl, Seq("source", "lang"), "left")
        .select(col("source"), col("n_s"), col("n"), col("g"),
          coalesce(col("c"), lit(0L)).as("c"))
        .groupBy(col("source"), col("n_s"), col("n"))
        .agg(sum(abs(col("c") * col("n") - col("g") * col("n_s"))).as("tv_num"))
        .select(col("source"), col("n_s"), col("tv_num"),
          (col("tv_num").cast("double") /
            (lit(2L) * col("n_s") * col("n")).cast("double")).as("tv"))
        .orderBy(col("source"))
    }, Some("""
      WITH sl AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
      st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM sl GROUP BY 1),
      gl AS (SELECT lang, CAST(sum(c) AS BIGINT) AS g FROM sl GROUP BY 1),
      gt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM sl),
      grid AS (
        SELECT st.source, st.n_s, gt.n, gl.lang, gl.g, coalesce(sl.c, 0) AS c
        FROM st CROSS JOIN gl CROSS JOIN gt
        LEFT JOIN sl ON sl.source = st.source AND sl.lang = gl.lang)
      SELECT source, n_s,
             CAST(sum(abs(c * n - g * n_s)) AS BIGINT) AS tv_num,
             CAST(sum(abs(c * n - g * n_s)) AS DOUBLE)
               / CAST(2 * n_s * n AS DOUBLE) AS tv
      FROM grid GROUP BY source, n_s, n ORDER BY source""")),

    QueryDef("drift_decile_bounds", (s, dir) => decileBounds(t("events")(s, dir)),
      Some("""
      WITH b AS (
        SELECT CAST(floor(value * 100) AS BIGINT) AS bin,
               CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS a
        FROM events),
      c AS (SELECT bin, CAST(sum(a) AS BIGINT) AS ca,
                   CAST(sum(1 - a) AS BIGINT) AS cb
            FROM b GROUP BY bin),
      cum AS (
        SELECT bin,
               CAST(sum(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
               CAST(sum(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
        FROM c),
      t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM c),
      d AS (SELECT unnest(generate_series(1, 9)) AS decile)
      SELECT CAST(d.decile AS BIGINT) AS decile,
             min(CASE WHEN cuma * 10 >= d.decile * t.n_a THEN bin END) AS bound_a,
             min(CASE WHEN cumb * 10 >= d.decile * t.n_b THEN bin END) AS bound_b,
             min(CASE WHEN cumb * 10 >= d.decile * t.n_b THEN bin END)
               - min(CASE WHEN cuma * 10 >= d.decile * t.n_a THEN bin END) AS gap
      FROM cum CROSS JOIN t CROSS JOIN d
      GROUP BY d.decile ORDER BY decile"""))
  )
}
