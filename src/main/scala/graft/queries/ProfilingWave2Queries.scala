package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalysisFns

/** Round-6 profiling wave 2: whole-table column profiling in one pass,
  * vocabulary construction with a global-sort-free exact ranking, and
  * robust (median/MAD) outlier detection on the discrete value grid —
  * the data-quality triage steps that run before a training-data
  * pipeline commits to a corpus.
  */
object ProfilingWave2Queries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Whole-table column profile in ONE aggregate pass (row count, null
    // count, exact distinct count, typed min/max per column), unpivoted
    // to a (column, metrics) long form with `stack`. The multi-distinct
    // agg plans as one Expand ×(columns+1) — a single scan, no
    // re-reading per column (the naive profiler loops one query per
    // column). min/max normalize to strings AFTER the typed aggregate
    // (numeric min, then cast), decimals/dates through the exactness
    // idioms. At 100 TB the exact distincts are the expensive choice —
    // the HLL sketch family (sketch_hll_*) is the approx path.
    QueryDef("profile_table_summary", (s, dir) => {
      val o = t("orders")(s, dir)
      val a = o.agg(
        count(lit(1)).as("n"),
        count(col("o_orderkey")).as("c1"), count_distinct(col("o_orderkey")).as("d1"),
        min(col("o_orderkey")).cast("string").as("mn1"),
        max(col("o_orderkey")).cast("string").as("mx1"),
        count(col("o_custkey")).as("c2"), count_distinct(col("o_custkey")).as("d2"),
        min(col("o_custkey")).cast("string").as("mn2"),
        max(col("o_custkey")).cast("string").as("mx2"),
        count(col("o_orderstatus")).as("c3"), count_distinct(col("o_orderstatus")).as("d3"),
        min(col("o_orderstatus")).as("mn3"), max(col("o_orderstatus")).as("mx3"),
        count(col("o_totalprice")).as("c4"), count_distinct(col("o_totalprice")).as("d4"),
        min(col("o_totalprice").cast("decimal(18,2)")).cast("string").as("mn4"),
        max(col("o_totalprice").cast("decimal(18,2)")).cast("string").as("mx4"),
        count(col("o_orderdate")).as("c5"), count_distinct(col("o_orderdate")).as("d5"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("mn5"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss").as("mx5"),
        count(col("o_orderpriority")).as("c6"), count_distinct(col("o_orderpriority")).as("d6"),
        min(col("o_orderpriority")).as("mn6"), max(col("o_orderpriority")).as("mx6"))
      a.select(col("n"), expr("""stack(6,
          'o_orderkey',     n - c1, d1, mn1, mx1,
          'o_custkey',      n - c2, d2, mn2, mx2,
          'o_orderstatus',  n - c3, d3, mn3, mx3,
          'o_totalprice',   n - c4, d4, mn4, mx4,
          'o_orderdate',    n - c5, d5, mn5, mx5,
          'o_orderpriority',n - c6, d6, mn6, mx6)
          AS (column_name, n_null, n_distinct, min_val, max_val)"""))
        .select(col("column_name"), col("n"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"))
        .orderBy(col("column_name"))
    }, Some("""
      WITH a AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(count(o_orderkey) AS BIGINT) c1, CAST(count(DISTINCT o_orderkey) AS BIGINT) d1,
          CAST(min(o_orderkey) AS VARCHAR) mn1, CAST(max(o_orderkey) AS VARCHAR) mx1,
          CAST(count(o_custkey) AS BIGINT) c2, CAST(count(DISTINCT o_custkey) AS BIGINT) d2,
          CAST(min(o_custkey) AS VARCHAR) mn2, CAST(max(o_custkey) AS VARCHAR) mx2,
          CAST(count(o_orderstatus) AS BIGINT) c3, CAST(count(DISTINCT o_orderstatus) AS BIGINT) d3,
          min(o_orderstatus) mn3, max(o_orderstatus) mx3,
          CAST(count(o_totalprice) AS BIGINT) c4, CAST(count(DISTINCT o_totalprice) AS BIGINT) d4,
          CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) mn4,
          CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) mx4,
          CAST(count(o_orderdate) AS BIGINT) c5, CAST(count(DISTINCT o_orderdate) AS BIGINT) d5,
          strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') mn5,
          strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') mx5,
          CAST(count(o_orderpriority) AS BIGINT) c6, CAST(count(DISTINCT o_orderpriority) AS BIGINT) d6,
          min(o_orderpriority) mn6, max(o_orderpriority) mx6
        FROM orders)
      SELECT * FROM (
        SELECT 'o_orderkey' AS column_name, n, n - c1 AS n_null, d1 AS n_distinct, mn1 AS min_val, mx1 AS max_val FROM a
        UNION ALL SELECT 'o_custkey', n, n - c2, d2, mn2, mx2 FROM a
        UNION ALL SELECT 'o_orderstatus', n, n - c3, d3, mn3, mx3 FROM a
        UNION ALL SELECT 'o_totalprice', n, n - c4, d4, mn4, mx4 FROM a
        UNION ALL SELECT 'o_orderdate', n, n - c5, d5, mn5, mx5 FROM a
        UNION ALL SELECT 'o_orderpriority', n, n - c6, d6, mn6, mx6 FROM a)
      ORDER BY column_name""")),

    // Vocabulary build (term → stable integer id by frequency rank,
    // min-count cutoff) WITHOUT a global sort: vocab_id =
    // (#terms with higher freq) + (rank within the freq tier by term).
    // The tier-base table is |distinct freq values| rows (tiny — folded
    // via a non-equi self-join on that tiny table, no partition-less
    // window), and the within-tier window partitions BY freq, so no
    // task ranks more than one tier. The oracle takes the global
    // `row_number() OVER (ORDER BY freq DESC, term)` route — matching
    // hashes prove the decomposition is the identical total order.
    QueryDef("text_vocab", (s, dir) => {
      val freq = t("documents")(s, dir)
        .select(explode(TextAnalysisFns.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .where(col("freq") >= 5)
      val hist = freq.groupBy(col("freq")).agg(count(lit(1)).as("nterms"))
      val base = hist.as("a")
        .join(hist.as("b"), col("b.freq") > col("a.freq"), "left")
        .groupBy(col("a.freq").as("freq"))
        .agg(coalesce(sum(col("b.nterms")), lit(0L)).as("base"))
      val wt = Window.partitionBy(col("freq")).orderBy(col("term"))
      freq.join(broadcast(base), Seq("freq"))
        .withColumn("vocab_id", col("base") + row_number().over(wt))
        .select(col("term"), col("freq"), col("vocab_id"))
        .orderBy(col("vocab_id"))
    }, Some(s"""
      WITH toks AS (
        SELECT unnest(${Sql.tokens("text")}) AS term FROM documents),
      freq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS freq FROM toks
        GROUP BY 1 HAVING count(*) >= 5)
      SELECT term, freq,
             CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS vocab_id
      FROM freq ORDER BY vocab_id""")),

    // Robust outliers per event type: median and MAD computed EXACTLY on
    // the cent-discrete value grid via the two-phase histogram (the
    // stats_percentile_mode pattern — cross-multiplied BIGINT threshold,
    // no float percentile), flag |v − med| > 3·MAD. Two grouped
    // histogram aggs + two broadcast joins; the fact is never sorted or
    // windowed — each histogram window runs over the tiny per-type grid.
    QueryDef("stats_mad_outliers", (s, dir) => {
      val ev = t("events")(s, dir)
        .select(col("event_type"), col("value").cast("decimal(12,2)").as("v"))
      def halfPoint(df: org.apache.spark.sql.DataFrame, vc: String, out: String) = {
        val hist = df.groupBy(col("event_type"), col(vc))
          .agg(count(lit(1)).as("cnt"))
        val h2 = hist
          .withColumn("cum", sum(col("cnt")).over(
            Window.partitionBy(col("event_type")).orderBy(col(vc))))
          .withColumn("n", sum(col("cnt")).over(
            Window.partitionBy(col("event_type"))))
        h2.groupBy(col("event_type"))
          .agg(min(when(col("cum") * 2 >= col("n"), col(vc))).as(out))
      }
      val med = halfPoint(ev, "v", "med")
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("ad", abs(col("v") - col("med")))
      val mad = halfPoint(dev, "ad", "mad")
      dev.join(broadcast(mad), Seq("event_type"))
        .where(col("ad") > col("mad") * 3)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_outliers"),
          min(col("v")).cast("double").as("min_out"),
          max(col("v")).cast("double").as("max_out"))
        .orderBy(col("event_type"))
    }, Some("""
      WITH e AS (
        SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v FROM events),
      h AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
      h2 AS (SELECT event_type, v, cnt,
               CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v) AS BIGINT) AS cum,
               CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
             FROM h),
      med AS (SELECT event_type, min(CASE WHEN cum * 2 >= n THEN v END) AS med
              FROM h2 GROUP BY 1),
      d AS (SELECT e.event_type, e.v, abs(e.v - med.med) AS ad
            FROM e JOIN med USING (event_type)),
      dh AS (SELECT event_type, ad, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1, 2),
      dh2 AS (SELECT event_type, ad, cnt,
                CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY ad) AS BIGINT) AS cum,
                CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
              FROM dh),
      mad AS (SELECT event_type, min(CASE WHEN cum * 2 >= n THEN ad END) AS mad
              FROM dh2 GROUP BY 1)
      SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_outliers,
             CAST(min(d.v) AS DOUBLE) AS min_out,
             CAST(max(d.v) AS DOUBLE) AS max_out
      FROM d JOIN mad USING (event_type)
      WHERE d.ad > mad.mad * 3
      GROUP BY 1 ORDER BY 1"""))
  )
}
