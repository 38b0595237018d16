package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-3 classic decision-support shapes (TPC-H Q10/Q15/Q17/Q18/Q22
  * analogs, adapted to the columns the test tables actually carry — no
  * partsupp, no commitdate). These are the canonical Catalyst
  * decorrelation and aggregate-join exhibits: correlated scalar
  * subqueries, HAVING over a pre-join aggregate, scalar-max selection,
  * NOT EXISTS + scalar-subquery filters. Money math goes through DECIMAL
  * with one final cast; averages are computed as decimal-sum ÷ count with
  * the identical double expression on both sides (native avg() float
  * accumulation order is engine-dependent).
  */
object TpchShapeQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Q10 shape: revenue lost to returns, per customer, top 20. The
    // returnflag filter reaches the lineitem scan; customer/orders are
    // the broadcast sides of the fact join.
    QueryDef("q10_returns_revenue", (s, dir) => {
      val li = t("lineitem")(s, dir).where(col("l_returnflag") === "R")
      val ord = t("orders")(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val cust = t("customer")(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,8)")).as("rev"))
        .orderBy(col("rev").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("rev").cast("double").as("revenue"))
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8)))
                  AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_mktsegment
      ORDER BY sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) DESC,
               c_custkey
      LIMIT 20""")),

    // Q15 shape: supplier(s) with the maximum quarterly revenue — the
    // scalar-max selection. The max is a 1-row aggregate broadcast into
    // the filter (never collected to the driver); DECIMAL keeps the
    // equality comparison exact where float revenue would make "equal to
    // max" engine-dependent.
    QueryDef("q15_top_supplier", (s, dir) => {
      val revs = t("lineitem")(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,8)")).as("rev"))
      val mx = revs.agg(max(col("rev")).as("mx"))
      val sup = t("supplier")(s, dir).select(col("s_suppkey"), col("s_name"))
      revs.join(broadcast(mx), col("rev") === col("mx"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("rev").cast("double").as("total_rev"))
        .orderBy(col("s_suppkey"))
    }, Some("""
      WITH revs AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8))) AS rev
        FROM lineitem
        WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
          AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_rev
      FROM revs JOIN supplier ON l_suppkey = s_suppkey
      WHERE rev = (SELECT max(rev) FROM revs)
      ORDER BY s_suppkey""")),

    // Q17 shape: revenue impact of small-quantity orders — the classic
    // correlated scalar subquery (per-part average quantity) that
    // Catalyst decorrelates into an aggregate join. The 0.2×avg threshold
    // is decimal-sum ÷ count in the same order on both sides.
    QueryDef("q17_small_qty_revenue", (s, dir) => {
      // Selective-part-first rewrite of the correlated form: Catalyst
      // decorrelates the scalar subquery into an aggregate over ALL of
      // lineitem grouped by partkey — but the correlation only ever probes
      // partkeys of one brand (~1/25 of part). Restricting lineitem to
      // those partkeys FIRST (broadcast semi of the brand's keys) leaves
      // the per-partkey average computed over exactly the same rows — the
      // restriction is on the group key itself — while the avg aggregate
      // shrinks 25×. Same double operation tree as the oracle:
      // 0.2 * (CAST(sum(DECIMAL) AS DOUBLE) / count).
      val parts = t("part")(s, dir)
        .where(col("p_brand") === "Brand#4").select(col("p_partkey"))
      val lsel = t("lineitem")(s, dir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      val thr = lsel.groupBy(col("l_partkey"))
        .agg((lit(0.2) *
          (sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
            count(lit(1)))).as("__thr"))
        .withColumnRenamed("l_partkey", "__tk")
      lsel.join(thr, col("l_partkey") === col("__tk"))
        .where(col("l_quantity") < col("__thr"))
        .agg((sum(col("l_extendedprice").cast("decimal(28,8)")).cast("double") /
          lit(7.0)).cast("double").as("avg_yearly"))
    }, Some("""
      SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) / 7.0
                  AS DOUBLE) AS avg_yearly
      FROM lineitem l JOIN part p ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#4'
        AND l_quantity < (
          SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                        / count(*))
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""")),

    // Q18 shape: large-volume orders — HAVING over a pre-join aggregate;
    // the aggregate side is computed FIRST (one lineitem shuffle), then
    // joined to orders/customer. sum_qty stays DECIMAL through the
    // threshold compare.
    QueryDef("q18_large_orders", (s, dir) => {
      val big = t("lineitem")(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sum_qty"))
        .where(col("sum_qty") > 150)
      val ord = t("orders")(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      val cust = t("customer")(s, dir).select(col("c_custkey"), col("c_name"))
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("o_orderkey"))
    }, Some("""
      SELECT c_custkey, c_name, o_orderkey,
             CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice,
             CAST(sum_qty AS DOUBLE) AS sum_qty
      FROM (
        SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 150) big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey""")),

    // Q12 shape: conditional counts over a fact join — per line status,
    // how many lines belong to high- vs low-priority orders within a ship
    // window. Both branch counts come out of ONE pass (commutative
    // conditional sums, map-side partials intact).
    QueryDef("q12_priority_lines", (s, dir) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t("lineitem")(s, dir)
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
               col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
        .join(t("orders")(s, dir).select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_lines"),
             sum(when(hi, 0L).otherwise(1L)).as("low_lines"))
        .orderBy(col("l_linestatus"))
    }, Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01 00:00:00'
        AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Q19 shape: disjunction of conjunctive brand/size/quantity clauses —
    // the OR-of-ANDs predicate Catalyst splits so the common p_partkey
    // equi-key still drives a hash join (the ORs become a post-join
    // filter, with the brand/size disjunction pushable to the part scan).
    QueryDef("q19_disjunctive_revenue", (s, dir) => {
      val li = t("lineitem")(s, dir)
      val p = t("part")(s, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
      val clause = (
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(5, 20) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(10, 40) &&
          col("l_quantity").between(20, 50)))
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .where(clause)
        .agg(count(lit(1)).as("n_lines"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,8)")).cast("double").as("revenue"))
    }, Some("""
      SELECT count(*) AS n_lines,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,8)))
                  AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand='Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
         OR (p_brand='Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand='Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)""")),

    // Q20 shape: the semi-join chain — suppliers who shipped more than a
    // threshold quantity of red parts. The part filter narrows via
    // left_semi (never widening the fact row), the HAVING threshold
    // applies to the per-supplier aggregate, and supplier names come from
    // a broadcast join at the end.
    QueryDef("q20_red_part_suppliers", (s, dir) => {
      val redParts = t("part")(s, dir)
        .where(col("p_name").like("red%")).select(col("p_partkey"))
      val agged = t("lineitem")(s, dir)
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("red_qty"))
        .where(col("red_qty") > 1500)
      agged.join(broadcast(t("supplier")(s, dir).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("red_qty").cast("double").as("red_qty"))
        .orderBy(col("s_suppkey"))
    }, Some("""
      SELECT s_suppkey, s_name, CAST(red_qty AS DOUBLE) AS red_qty
      FROM (
        SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS red_qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 1500) a
      JOIN supplier ON l_suppkey = s_suppkey
      ORDER BY s_suppkey""")),

    // Q22 shape: well-funded customers gone DORMANT (no order since
    // 2000 — at this SF every customer has ordered at least once, so the
    // classic never-ordered predicate is vacuous) — NOT EXISTS with an
    // extra predicate (planned as an anti join) gated by a
    // scalar-subquery average (decimal-sum ÷ count, broadcast into the
    // filter), grouped by a derived code.
    QueryDef("q22_idle_customers", (s, dir) => {
      t("customer")(s, dir).createOrReplaceTempView("q22_customer_v")
      t("orders")(s, dir).createOrReplaceTempView("q22_orders_v")
      s.sql("""
        SELECT c_nationkey % 5 AS code, count(*) AS n_cust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        FROM q22_customer_v c
        WHERE c_acctbal > (
            SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
            FROM q22_customer_v c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (
            SELECT 1 FROM q22_orders_v o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey % 5
        ORDER BY code""")
    }, Some("""
      SELECT c_nationkey % 5 AS code, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      FROM customer c
      WHERE c_acctbal > (
          SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
          FROM customer c2 WHERE c2.c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND CAST(o.o_orderdate AS TIMESTAMP) >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY c_nationkey % 5
      ORDER BY code"""))
  )

  /** Round-4 second wave: Q4/Q7/Q8/Q9/Q13/Q21 analogs (lateness = shipped
    * more than K days after the order date — the schema has no
    * commit/receipt dates). Registered separately so the round-3 list
    * above stays stable.
    */
  val wave2: Seq[QueryDef] = Seq(

    // Q4 shape: EXISTS → semi join; orders with any late-shipped line,
    // counted by priority. The date-window filter pushes to the orders
    // scan; the semi join keeps orders single-counted regardless of how
    // many lines were late.
    QueryDef("q4_late_orders", (s, dir) => {
      val ord = t("orders")(s, dir)
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
               col("o_orderdate") <  lit("1997-07-01").cast("timestamp"))
      val li = t("lineitem")(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders o
      WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01'
        AND CAST(o_orderdate AS TIMESTAMP) <  TIMESTAMP '1997-07-01'
        AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND CAST(l.l_shipdate AS TIMESTAMP) >
                CAST(o.o_orderdate AS TIMESTAMP) + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Q7 shape: volume shipping between two nations, both directions, by
    // ship year. All four dims broadcast; one fact shuffle for the final
    // group.
    QueryDef("q7_volume_shipping", (s, dir) => {
      val li = t("lineitem")(s, dir)
      val ord = t("orders")(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val cust = t("customer")(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val supp = t("supplier")(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val nat = t("nation")(s, dir).select(col("n_nationkey"), col("n_name"))
      val cn = nat.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
      val sn = nat.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cn), col("c_nationkey") === col("cnk"))
        .join(broadcast(sn), col("s_nationkey") === col("snk"))
        .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
               (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,8)")).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }, Some("""
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             year(CAST(l_shipdate AS TIMESTAMP)) AS l_year,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,8))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // Q8 shape: market share of one supplier nation within a region's
    // market for one part type, by order year — conditional DECIMAL sum
    // over total DECIMAL sum, both exact, ONE final double division.
    QueryDef("q8_market_share", (s, dir) => {
      val li = t("lineitem")(s, dir)
      val ord = t("orders")(s, dir).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"))
      val prt = t("part")(s, dir).where(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val cust = t("customer")(s, dir).select(col("c_custkey"), col("c_nationkey"))
      val nat = t("nation")(s, dir)
      val reg = t("region")(s, dir).where(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      val cnat = nat.select(col("n_nationkey").as("cnk"), col("n_regionkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .select(col("cnk"))
      val supp = t("supplier")(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val snat = nat.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,8)")
      li.join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(cnat), col("c_nationkey") === col("cnk"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(snat), col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0).cast("decimal(28,8)"))).as("__n"),
          sum(vol).as("__d"))
        .select(col("o_year"),
          (col("__n").cast("double") / col("__d").cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }, Some("""
      SELECT year(CAST(o_orderdate AS TIMESTAMP)) AS o_year,
             CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                           THEN CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(28,8))
                           ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(28,8))) AS DOUBLE) AS mkt_share
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey AND p_type = 'PROMO'
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      GROUP BY 1 ORDER BY 1""")),

    // Q9 shape (no partsupp → revenue, not profit): per supplier nation ×
    // ship year over parts whose name carries one token. The name filter
    // prunes part before the broadcast; money in DECIMAL.
    QueryDef("q9_product_revenue", (s, dir) => {
      val prt = t("part")(s, dir).where(col("p_name").contains("red"))
        .select(col("p_partkey"))
      val supp = t("supplier")(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      val nat = t("nation")(s, dir).select(col("n_nationkey"), col("n_name"))
      t("lineitem")(s, dir)
        .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,8)")).cast("double").as("revenue"))
        .orderBy(col("nation"), col("l_year").desc)
    }, Some("""
      SELECT n_name AS nation, year(CAST(l_shipdate AS TIMESTAMP)) AS l_year,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,8))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey AND contains(p_name, 'red')
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY 1, 2 ORDER BY nation, l_year DESC""")),

    // Q13 shape: customer order-count distribution — LEFT join (idle
    // customers count as 0) with the filter INSIDE the join, then a
    // second aggregation over the counts.
    QueryDef("q13_order_distribution", (s, dir) => {
      val cust = t("customer")(s, dir).select(col("c_custkey"))
      val ord = t("orders")(s, dir)
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }, Some("""
      SELECT c_count, count(*) AS custdist
      FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // Q21 shape: suppliers who were the SOLE late shipper on a
    // multi-supplier order (late = shipped > 30 days after the order
    // date). The EXISTS / NOT-EXISTS pair is computed as per-order
    // distinct-supplier aggregates — one pass over the fact instead of
    // two correlated probes; numwait counts distinct such orders.
    QueryDef("q21_sole_late_supplier", (s, dir) => {
      val li = t("lineitem")(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val ord = t("orders")(s, dir).select(col("o_orderkey"), col("o_orderdate"))
      val flagged = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("__late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      // ONE pass over the fact: the sole late supplier is recoverable
      // inside the same aggregate — when exactly one distinct supplier
      // shipped late, max(late suppkey) IS that supplier. (The earlier
      // form joined `flagged` back to `perOrder`, shuffling the
      // lineitem⋈orders join twice.) TWO-LEVEL exact distinct (round 16):
      // the two count_distincts over different exprs planned as an
      // Expand ×3 — every post-join fact row tripled through the hash
      // aggregate. Grouping by (order, supplier) first (map-side partial
      // aggregation shrinks the shuffle to the distinct pairs), the
      // distinct counts become plain integer counts over that table —
      // identical values, no Expand, fewer shuffled bytes (§2.3).
      val perPair = flagged.groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("__late")).as("__any_late"))
      val perOrder = perPair.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("__n_supp"),
          count(when(col("__any_late"), lit(1))).as("__n_late"),
          max(when(col("__any_late"), col("l_suppkey"))).as("__sole"))
      val supp = t("supplier")(s, dir).select(col("s_suppkey"), col("s_name"))
      perOrder.where(col("__n_supp") > 1 && col("__n_late") === 1)
        .join(broadcast(supp), col("__sole") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }, Some("""
      WITH flagged AS (
        SELECT l_orderkey, l_suppkey,
               CAST(l_shipdate AS TIMESTAMP) >
                 CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
        FROM flagged GROUP BY l_orderkey),
      waiting AS (
        SELECT DISTINCT f.l_suppkey, f.l_orderkey
        FROM flagged f JOIN per_order p ON f.l_orderkey = p.l_orderkey
        WHERE f.late AND p.n_supp > 1 AND p.n_late = 1)
      SELECT s_name, count(*) AS numwait
      FROM waiting JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name ORDER BY numwait DESC, s_name
      LIMIT 20"""))
  )

  /** Round-4 third wave: the partsupp-based shapes (Q2/Q16), re-based on
    * lineitem's observed (part, supplier) pairs since the synthetic
    * schema carries no partsupp table — the join/agg shapes are the
    * point, not the exact TPC-H columns.
    */
  val wave3: Seq[QueryDef] = Seq(

    // Q2 analog — min-cost supplier per part: per-partkey argmin over
    // lineitem (min price, ties to the smallest suppkey) via ONE
    // max/min(struct) aggregation — no correlated subquery, no window
    // over the fact, then broadcast part/supplier/nation dims onto the
    // small per-part result. The oracle takes the two-CTE
    // min-then-min-tiebreak route; struct-min must agree exactly.
    QueryDef("q2_min_cost_supplier", (s, dir) => {
      val li = t("lineitem")(s, dir)
      val best = li.groupBy(col("l_partkey"))
        .agg(min(struct(col("l_extendedprice").as("price"),
          col("l_suppkey").as("supp"))).as("b"))
        .select(col("l_partkey"), col("b.price").as("min_price"),
          col("b.supp").as("s_suppkey"))
      val part = t("part")(s, dir)
        .where(col("p_size") <= 25 && col("p_type") === "LARGE")
      val supp = t("supplier")(s, dir)
      val nat = t("nation")(s, dir)
      best.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), "s_suppkey")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("p_partkey"), col("p_brand"), col("min_price"),
          col("s_name"), col("n_name"))
        .orderBy(col("min_price"), col("p_partkey"))
        .limit(100)
    }, Some("""
      WITH best0 AS (
        SELECT l_partkey, min(l_extendedprice) AS min_price
        FROM lineitem GROUP BY l_partkey),
      best AS (
        SELECT b.l_partkey, b.min_price, min(l.l_suppkey) AS s_suppkey
        FROM best0 b JOIN lineitem l
          ON l.l_partkey = b.l_partkey AND l.l_extendedprice = b.min_price
        GROUP BY b.l_partkey, b.min_price)
      SELECT p_partkey, p_brand, min_price, s_name, n_name
      FROM best
      JOIN part ON l_partkey = p_partkey
      JOIN supplier USING (s_suppkey)
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_size <= 25 AND p_type = 'LARGE'
      ORDER BY min_price, p_partkey
      LIMIT 100""")),

    // Q16 analog — supplier variety per (brand, size): distinct supplier
    // counts over lineitem's observed pairs, excluding a brand and the
    // negative-balance suppliers (the complaints analog) via a broadcast
    // anti join BEFORE the distinct-count shuffle.
    QueryDef("q16_part_supplier_variety", (s, dir) => {
      val pairs = t("lineitem")(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val part = t("part")(s, dir).where(col("p_brand") =!= "Brand#1")
      val bad = t("supplier")(s, dir).where(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      pairs
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }, Some("""
      SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1'
        AND NOT EXISTS (SELECT 1 FROM supplier
                        WHERE s_acctbal < 0 AND s_suppkey = l_suppkey)
      GROUP BY p_brand, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_size""")),

    // Q11 analog — value concentration (the one classic shape previously
    // missing; no partsupp table, so lineitem value per part over one
    // nation-group's suppliers stands in for partsupp value). Parts whose
    // value exceeds fraction 1/10000 of the nation's total: the
    // group-share-vs-scalar-subquery-threshold shape. The threshold
    // comparison is EXACT decimal — `value·10000 > total` instead of
    // `value > total·0.0001` — so no boundary row depends on float
    // rounding; the total is a 1-row aggregate broadcast into the
    // filter, never collected.
    QueryDef("q11_value_concentration", (s, dir) => {
      val li = t("lineitem")(s, dir)
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      val supp = t("supplier")(s, dir).where(col("s_nationkey") % 5 === 2)
        .select(col("s_suppkey"))
      val vals = li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("__val"))
      val tot = vals.agg(sum(col("__val")).as("__tot"))
      vals.crossJoin(broadcast(tot))
        .where(col("__val") * lit(10000) > col("__tot"))
        .select(col("l_partkey"), col("__val").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }, Some("""
      WITH v AS (
        SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey % 5 = 2
        GROUP BY l_partkey)
      SELECT l_partkey, CAST(val AS DOUBLE) AS value
      FROM v
      WHERE val * 10000 > (SELECT sum(val) FROM v)
      ORDER BY value DESC, l_partkey"""))
  )
}
