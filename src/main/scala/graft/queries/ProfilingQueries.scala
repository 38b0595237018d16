package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 profiling wave: higher statistical moments (skewness /
  * kurtosis) from exact DECIMAL raw moments, cumulative-distribution and
  * ratio-to-report windows, array set-operation cardinalities, and the
  * bitwise scalar family.
  *
  * Float-safety rules for the moments: every aggregate is a DECIMAL raw
  * moment (order-free addition); the final skew/kurt chain uses ONLY
  * +,−,×,÷ and sqrt — all IEEE correctly-rounded, so both engines produce
  * the same float64 bit pattern. pow(x, 1.5) is libm (NOT portable) and
  * is spelled v*sqrt(v) instead.
  */
object ProfilingQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  /** Exact Gini of a non-negative long column `v` (see
    * `stats_gini_doclen`): count-of-counts grid → doubled rank-weighted
    * block sums → G = W/(n·T) − (n+1)/n. Integers until the final three
    * mirrored IEEE ops; ties need no order.
    */
  def giniLong(values: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val grid = values.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = grid.withColumn("o",
      coalesce(sum(col("c")).over(w), lit(0L)))
    cum.agg(
        sum(col("c")).as("n"),
        sum(col("v") * col("c")).as("total"),
        sum(col("v") * (lit(2L) * col("c") * col("o") +
          col("c") * (col("c") + lit(1L)))).as("w2"))
      .select(col("n"), col("total"),
        (col("w2").cast("double") / (col("n") * col("total")).cast("double") -
          (col("n") + lit(1L)).cast("double") / col("n").cast("double"))
          .as("gini"))
  }

  val defs: Seq[QueryDef] = Seq(

    // Gini coefficient of document lengths — corpus inequality: is the
    // token mass spread across documents or concentrated in a few
    // giants? Exact via the count-of-counts grid: for a length v with
    // count c at cumulative offset o, the doubled rank-weighted sum over
    // its block is v·(2co + c(c+1)) — ALL integers (ties need no order),
    // G = W/(n·T) − (n+1)/n is three IEEE ops mirrored verbatim. Scale:
    // the grid and its cumsum run over DISTINCT LENGTHS (bounded by the
    // max doc length), never over docs.
    QueryDef("stats_gini_doclen", (s, dir) =>
      giniLong(t("documents")(s, dir)
        .select(size(graft.functions.TextAnalysisFns.tokens(col("text")))
          .cast("long").as("v")))
    , Some {
      val toks = Sql.tokens("text")
      s"""
      WITH lv AS (SELECT CAST(len($toks) AS BIGINT) AS v FROM documents),
      g AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM lv GROUP BY v),
      cw AS (SELECT v, c,
                    CAST(coalesce(sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS o
             FROM g),
      a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(v * c) AS BIGINT) AS total,
                   CAST(sum(v * (2 * c * o + c * (c + 1))) AS BIGINT) AS w2
            FROM cw)
      SELECT n, total,
             CAST(w2 AS DOUBLE) / CAST(n * total AS DOUBLE)
               - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
      FROM a"""
    }),

    // Lorenz-curve deciles — Gini's companion exhibit: for each decile d
    // of documents (ordered by length), the cumulative share of total
    // tokens held by the bottom d·10%. Same count-of-counts grid as
    // stats_gini_doclen; the decile row count comes from the
    // cross-multiplied threshold (cum_docs·10 ≥ d·n), its token share is
    // the cumulative-token sum at that boundary plus the partial block —
    // all integers, two final divisions per row mirrored verbatim.
    QueryDef("stats_lorenz_doclen", (s, dir) => {
      val grid = t("documents")(s, dir)
        .select(size(graft.functions.TextAnalysisFns.tokens(col("text")))
          .cast("long").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = grid
        .withColumn("cd", sum(col("c")).over(w))
        .withColumn("ct", sum(col("v") * col("c")).over(w))
      val tots = grid.agg(sum(col("c")).as("n"),
        sum(col("v") * col("c")).as("t"))
      val dec = cum.sparkSession.range(1, 10).select(col("id").as("decile"))
      // boundary row for decile d: the first grid value whose cumulative
      // doc count clears d·n/10; docs beyond the boundary inside that
      // value block contribute v each
      // cd and ct are monotone in v, so the boundary row's three fields
      // are three independent mins — no struct-min needed on either side
      val cut = expr("(decile * n + 9) DIV 10")
      val bottom = col("bct") - (col("bcd") - cut) * col("bv")
      cum.crossJoin(broadcast(tots)).crossJoin(broadcast(dec))
        .where(col("cd") * 10 >= col("decile") * col("n"))
        .groupBy(col("decile"), col("n"), col("t"))
        .agg(min(col("v")).as("bv"), min(col("cd")).as("bcd"),
          min(col("ct")).as("bct"))
        .select(col("decile"),
          // tokens held by the bottom ceil(d·n/10) docs: cumulative tokens
          // through the boundary value, minus the boundary-block docs
          // ABOVE the decile cut (each of length bv)
          bottom.as("tokens_bottom"),
          col("t").as("tokens_total"),
          (bottom.cast("double") / col("t").cast("double")).as("share"))
        .orderBy(col("decile"))
    }, Some {
      val toks = Sql.tokens("text")
      s"""
      WITH lv AS (SELECT CAST(len($toks) AS BIGINT) AS v FROM documents),
      g AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM lv GROUP BY v),
      cw AS (SELECT v,
                    CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cd,
                    CAST(sum(v * c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ct
             FROM g),
      tt AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(v * c) AS BIGINT) AS t FROM g),
      d AS (SELECT unnest(generate_series(1, 9)) AS decile),
      b AS (SELECT d.decile, tt.n, tt.t,
                   min(cw.v) AS bv, min(cw.cd) AS bcd, min(cw.ct) AS bct
            FROM cw CROSS JOIN tt CROSS JOIN d
            WHERE cw.cd * 10 >= d.decile * tt.n
            GROUP BY d.decile, tt.n, tt.t)
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(bct - (bcd - (decile * n + 9) // 10) * bv AS BIGINT) AS tokens_bottom,
             t AS tokens_total,
             CAST(bct - (bcd - (decile * n + 9) // 10) * bv AS DOUBLE)
               / CAST(t AS DOUBLE) AS share
      FROM b ORDER BY decile"""
    }),

    // Gini of per-user event counts — activity concentration: is the
    // event stream a broad population or a handful of power users?
    // Same giniLong machinery over a different value column (the grid
    // bound here is the max per-user count, not doc length).
    QueryDef("stats_gini_user_activity", (s, dir) =>
      giniLong(t("events")(s, dir)
        .groupBy(col("user_id")).agg(count(lit(1)).as("v"))
        .select(col("v")))
    , Some("""
      WITH uv AS (SELECT CAST(count(*) AS BIGINT) AS v
                  FROM events GROUP BY user_id),
      g AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM uv GROUP BY v),
      cw AS (SELECT v, c,
                    CAST(coalesce(sum(c) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS o
             FROM g),
      a AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(v * c) AS BIGINT) AS total,
                   CAST(sum(v * (2 * c * o + c * (c + 1))) AS BIGINT) AS w2
            FROM cw)
      SELECT n, total,
             CAST(w2 AS DOUBLE) / CAST(n * total AS DOUBLE)
               - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
      FROM a""")),

    // Grouped skewness / kurtosis (population form) from raw moments.
    // The moments are computed over integer CENTS (skew/kurt are
    // scale-invariant) and every double→DECIMAL cast happens BELOW 2^53:
    // Spark's cast goes through Double.toString (the SHORTEST round-trip
    // repr — above 2^53 it drops the exact binary integer), DuckDB casts
    // the exact binary value, so a 19-digit x⁴ diverges at the tail.
    // x, x², x³ are integral doubles < 2^53 (cast exact in both engines);
    // the 4th moment is the DECIMAL square of the exact second power.
    // The 19-20-digit moment sums go DECIMAL→VARCHAR→DOUBLE: DuckDB's
    // direct decimal→double is NOT correctly rounded above ~2^63 (two-
    // halves int128 conversion), but its strtod is — and Spark is
    // correctly rounded on both paths, so the string route agrees.
    QueryDef("stats_moments", (s, dir) => {
      val x = (col("value").cast("decimal(12,2)") * 100).cast("double")
      val x2d = (x * x).cast("decimal(38,0)")
      def d(c: org.apache.spark.sql.Column) = c.cast("string").cast("double")
      val agged = t("events")(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          d(sum(x.cast("decimal(38,0)"))).as("s1"),
          d(sum(x2d)).as("s2"),
          d(sum((x * x * x).cast("decimal(38,0)"))).as("s3"),
          d(sum(x2d * x2d)).as("s4"))
      val m = col("s1") / col("n")
      val m2 = col("s2") / col("n") - m * m
      val m3 = col("s3") / col("n") - lit(3.0) * m * (col("s2") / col("n")) +
        lit(2.0) * m * m * m
      val m4 = col("s4") / col("n") - lit(4.0) * m * (col("s3") / col("n")) +
        lit(6.0) * m * m * (col("s2") / col("n")) - lit(3.0) * m * m * m * m
      agged.select(col("event_type"), col("n"),
          (m3 / (m2 * sqrt(m2))).as("skew"),
          (m4 / (m2 * m2)).as("kurt"))
        .orderBy(col("event_type"))
    }, Some("""
      WITH c AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS DOUBLE) AS x
        FROM events),
      r AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(CAST(sum(CAST(x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS s1,
               CAST(CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS s2,
               CAST(CAST(sum(CAST(x * x * x AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS s3,
               CAST(CAST(sum(CAST(x * x AS DECIMAL(38,0)) * CAST(x * x AS DECIMAL(38,0)))
                         AS VARCHAR) AS DOUBLE) AS s4
        FROM c GROUP BY event_type),
      m AS (
        SELECT event_type, n, s1 / n AS m,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4.0 * (s1 / n) * (s3 / n) + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM r)
      SELECT event_type, n, m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) AS kurt
      FROM m ORDER BY event_type""")),

    // cume_dist (tie-stable: (# rows ≤ current)/n is the same integer
    // ratio in both engines) + ratio-to-report (share of the partition
    // total, DECIMAL denominator).
    QueryDef("win_cume_ratio", (s, dir) => {
      // Two-phase cume_dist: the naive window partitions by l_returnflag —
      // THREE partitions for the whole fact table, a single-task
      // serialization at scale. Instead: per-(flag, qty) counts/sums (one
      // map-side-combined shuffle of ≤ |flags|·|distinct qty| rows), the
      // running ratio over that TINY histogram, broadcast back to the
      // fact. cume_dist ≡ running_count/total by definition (exact long
      // counts, one double division — bit-identical to the native window),
      // and the per-flag DECIMAL total is associativity-exact regardless
      // of re-grouping. The fact table is never shuffled at all.
      val li = t("lineitem")(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
      val hist = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("__cnt"),
          sum(col("l_quantity").cast("decimal(18,4)")).as("__qsum"))
      val wRun = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("l_returnflag"))
      val cum = hist.select(col("l_returnflag"), col("l_quantity"),
        (sum(col("__cnt")).over(wRun).cast("double") /
          sum(col("__cnt")).over(wAll).cast("double")).as("cume"),
        sum(col("__qsum")).over(wAll).as("__tot"))
      li.join(broadcast(cum), Seq("l_returnflag", "l_quantity"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("cume"),
          (col("l_quantity") / col("__tot").cast("double")).as("qty_share"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — order by the full output tuple so the sort is total
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("cume"), col("qty_share"))
    }, Some("""
      SELECT l_orderkey, l_linenumber, l_returnflag,
             cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cume,
             l_quantity / CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
               OVER (PARTITION BY l_returnflag) AS DOUBLE) AS qty_share
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, l_returnflag, cume, qty_share""")),

    // Array set-operation cardinalities over generated int arrays
    // (union / intersect / except reduced to sizes — array OUTPUTS stay
    // forbidden, element order differs across engines).
    QueryDef("f31_array_setops", (s, dir) => {
      t("lineitem")(s, dir)
        .withColumn("a", sequence(lit(1), col("l_linenumber")))
        .withColumn("b", sequence(lit(2), col("l_linenumber") + 2))
        .select(col("l_orderkey"), col("l_linenumber"),
          size(array_union(col("a"), col("b"))).cast("long").as("n_union"),
          size(array_intersect(col("a"), col("b"))).cast("long").as("n_intersect"),
          size(array_except(col("a"), col("b"))).cast("long").as("n_except"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }, Some("""
      WITH g AS (
        SELECT l_orderkey, l_linenumber,
               generate_series(1, l_linenumber) AS a,
               generate_series(2, l_linenumber + 2) AS b
        FROM lineitem)
      SELECT l_orderkey, l_linenumber,
             CAST(len(list_distinct(list_concat(a, b))) AS BIGINT) AS n_union,
             CAST(len(list_intersect(a, b)) AS BIGINT) AS n_intersect,
             CAST(len(list_filter(list_distinct(a), x -> NOT list_contains(b, x)))
                  AS BIGINT) AS n_except
      FROM g ORDER BY l_orderkey, l_linenumber""")),

    // Bitwise scalar family: count/shift/xor/and/or — integer-exact.
    // (DuckDB's ^ is exponentiation, so xor() there vs ^ here.)
    QueryDef("f32_bitops", (s, dir) => {
      t("lineitem")(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("bit_count(l_partkey)").as("pop"),
          expr("shiftleft(l_linenumber, 2)").cast("long").as("shl"),
          expr("shiftright(l_partkey, 3)").as("shr"),
          expr("l_partkey ^ l_suppkey").as("bxor"),
          expr("l_partkey & l_suppkey").as("band"),
          expr("l_partkey | l_suppkey").as("bor"))
        // total order over the full output tuple — (l_orderkey,
        // l_linenumber) alone has duplicate groups in this table
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("bxor"),
          col("band"), col("pop"), col("shr"))
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             bit_count(l_partkey) AS pop,
             CAST(l_linenumber << 2 AS BIGINT) AS shl,
             l_partkey >> 3 AS shr,
             xor(l_partkey, l_suppkey) AS bxor,
             l_partkey & l_suppkey AS band,
             l_partkey | l_suppkey AS bor
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, bxor, band, pop, shr"""))
  )
}
