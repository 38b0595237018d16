package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-6 mining/audit wave: frequent-pair mining with association-rule
  * metrics (the A-priori first pass) and a snapshot diff audit (the
  * table-migration verification step). All integer counts; the rule
  * metrics are single divisions over exact integer products.
  */
object MiningDiffQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // Market-basket frequent pairs over the capped order/part incidence
    // (the dedup-family orderkey cap keeps bench pair counts
    // representative): support from the same-basket self-join, item
    // counts from one groupBy, confidence(a→b) = support/count(a) and
    // lift = support·N / (count(a)·count(b)) — integer products first
    // (exact BIGINT), ONE float division each, so the boundary rules
    // are bit-stable. Scale: the self-join is basket-keyed (never
    // all-pairs across baskets); item counts broadcast back onto the
    // support table; min-support prunes BEFORE the metric join.
    QueryDef("mine_frequent_pairs", (s, dir) => {
      val li = t("lineitem")(s, dir)
        .where(col("l_orderkey") <= 6000)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .cache()
      val nBaskets = li.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val itemCnt = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      val support = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"),
          col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("support_cnt"))
        .where(col("support_cnt") >= 3)
      support
        .join(broadcast(itemCnt.select(col("l_partkey").as("part_a"),
          col("cnt").as("cnt_a"))), Seq("part_a"))
        .join(broadcast(itemCnt.select(col("l_partkey").as("part_b"),
          col("cnt").as("cnt_b"))), Seq("part_b"))
        .crossJoin(broadcast(nBaskets))
        .select(col("part_a"), col("part_b"), col("support_cnt"),
          (col("support_cnt").cast("double") / col("cnt_a")).as("conf_a_b"),
          ((col("support_cnt") * col("n_baskets")).cast("double")
            / (col("cnt_a") * col("cnt_b"))).as("lift"))
        .orderBy(col("part_a"), col("part_b"))
    }, Some("""
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                  WHERE l_orderkey <= 6000),
      n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
            FROM li),
      ic AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
             FROM li GROUP BY 1),
      sup AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(count(*) AS BIGINT) AS support_cnt
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT part_a, part_b, support_cnt,
             CAST(support_cnt AS DOUBLE) / ca.cnt AS conf_a_b,
             CAST(support_cnt * n.n_baskets AS DOUBLE)
               / (ca.cnt * cb.cnt) AS lift
      FROM sup
      JOIN ic ca ON ca.l_partkey = sup.part_a
      JOIN ic cb ON cb.l_partkey = sup.part_b
      CROSS JOIN n
      ORDER BY part_a, part_b""")),

    // Snapshot diff audit: two deterministic snapshots derived from
    // orders (old = keys % 11 ≠ 0; new = keys % 13 ≠ 0 with totalprice
    // bumped on keys % 3 = 0), classified by ONE full-outer join on the
    // key into added / removed / changed / unchanged — the migration
    // verification every warehouse cutover runs. At scale this is the
    // one unavoidable co-shuffle of both snapshots; the classification
    // is a pure projection on top. Decimal compare is exact.
    QueryDef("table_diff_audit", (s, dir) => {
      val o = t("orders")(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val oldS = o.where(col("o_orderkey") % 11 =!= 0)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st_o"),
          col("o_totalprice").as("tp_o"))
      val newS = o.where(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey").as("k2"), col("o_orderstatus").as("st_n"),
          when(col("o_orderkey") % 3 === 0,
            col("o_totalprice") + lit(1)).otherwise(col("o_totalprice"))
            .as("tp_n"))
      oldS.join(newS, col("k") === col("k2"), "full_outer")
        .select(
          when(col("k").isNull, lit("added"))
            .when(col("k2").isNull, lit("removed"))
            .when(col("st_o") =!= col("st_n") || col("tp_o") =!= col("tp_n"),
              lit("changed"))
            .otherwise(lit("unchanged")).as("class"))
        .groupBy(col("class")).agg(count(lit(1)).as("n"))
        .orderBy(col("class"))
    }, Some("""
      WITH oldS AS (
        SELECT o_orderkey AS k, o_orderstatus AS st_o, o_totalprice AS tp_o
        FROM orders WHERE o_orderkey % 11 <> 0),
      newS AS (
        SELECT o_orderkey AS k2, o_orderstatus AS st_n,
               CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1
                    ELSE o_totalprice END AS tp_n
        FROM orders WHERE o_orderkey % 13 <> 0),
      j AS (
        SELECT CASE WHEN k IS NULL THEN 'added'
                    WHEN k2 IS NULL THEN 'removed'
                    WHEN st_o <> st_n OR tp_o <> tp_n THEN 'changed'
                    ELSE 'unchanged' END AS class
        FROM oldS FULL OUTER JOIN newS ON k = k2)
      SELECT class, CAST(count(*) AS BIGINT) AS n
      FROM j GROUP BY class ORDER BY class"""))
  )
}
