package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.SketchFns

/** Round-6 sketch/graph wave: KMV (k-minimum-values) sketches — the
  * mergeable distinct sketch that, unlike HLL, supports INTERSECTION
  * estimation — and fixed-iteration BFS reachability over the
  * co-purchase graph. KMV state is exact 52-bit integers (every value
  * double-representable, so the bounded top-k aggregate carries them
  * losslessly); BFS is all-integer.
  */
object SketchGraphQueries {

  private def t(name: String) = (s: org.apache.spark.sql.SparkSession, dir: String) =>
    Tables.load(s, dir, name)

  private val K = 64

  /** KMV estimator: exact size below k (the sketch IS the set), else
    * (k−1)·2^52 / kth-smallest — the classic KMV cardinality estimate.
    * Two double ops, identical in the oracle.
    */
  private def kmvEst(arr: Column): Column =
    when(size(arr) < K, size(arr).cast("double"))
      .otherwise(lit(63.0) * lit(4503599627370496.0)
        / element_at(arr, K).cast("double"))

  private val sqlKmvEst: String => String = arr =>
    s"""CASE WHEN len($arr) < $K THEN CAST(len($arr) AS DOUBLE)
        ELSE CAST(63.0 AS DOUBLE) * CAST(4503599627370496.0 AS DOUBLE)
             / CAST(($arr)[$K] AS DOUBLE) END"""

  val defs: Seq[QueryDef] = Seq(

    // KMV set-operation sketches over two event audiences: per type the
    // k=64 SMALLEST distinct user hashes (bounded TopKAgg on the negated
    // hash — partial state ≤2k values per partition, one tiny shuffle),
    // then pure array algebra on the two 64-value sketches: the union
    // sketch is the k smallest of the merged distinct values; the
    // intersection estimate is the matching-fraction rule
    // ρ·|A∪B| with ρ = |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)| — the law
    // that lets audience-overlap queries run on kilobyte sketches
    // instead of raw 100 TB scans. Hashes are 52-bit md5 prefixes:
    // exactly double-representable, so the aggregate is lossless and
    // the estimate is the same two float ops in both engines. Below k
    // distinct the sketch IS the set and every estimate is exact.
    QueryDef("sketch_kmv_setops", (s, dir) => {
      val h = SketchFns.hash52(col("user_id"))
      val du = t("events")(s, dir)
        .where(col("event_type").isin("click", "view"))
        .select(col("event_type"), h.as("h")).distinct()
      val kmv = du.groupBy(col("event_type"))
        .agg(graft.expressions.TopKAgg.topK(
          struct((-col("h")).cast("double"), col("h")), K).as("__top"))
        .select(col("event_type"),
          transform(col("__top"), e => e.getField("id")).as("kmv"))
      val a = kmv.where(col("event_type") === "click")
        .select(col("kmv").as("ka"))
      val b = kmv.where(col("event_type") === "view")
        .select(col("kmv").as("kb"))
      a.crossJoin(b)
        .withColumn("ku",
          slice(array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, K))
        .withColumn("n_common",
          size(array_intersect(array_intersect(col("ku"), col("ka")),
            col("kb"))))
        .select(
          kmvEst(col("ka")).as("est_a"),
          kmvEst(col("kb")).as("est_b"),
          kmvEst(col("ku")).as("est_union"),
          col("n_common").cast("long").as("n_common"),
          (col("n_common").cast("double") / size(col("ku"))
            * kmvEst(col("ku"))).as("est_intersection"))
    }, Some(s"""
      WITH du AS (
        SELECT DISTINCT event_type, ${Sql.hash52("user_id")} AS h
        FROM events WHERE event_type IN ('click', 'view')),
      ra AS (SELECT h FROM du WHERE event_type = 'click' ORDER BY h LIMIT $K),
      rb AS (SELECT h FROM du WHERE event_type = 'view' ORDER BY h LIMIT $K),
      a AS (SELECT list(h ORDER BY h) AS ka FROM ra),
      b AS (SELECT list(h ORDER BY h) AS kb FROM rb),
      u AS (
        SELECT ka, kb,
               list_sort(list_distinct(list_concat(ka, kb)))[1:$K] AS ku
        FROM a CROSS JOIN b),
      c AS (
        SELECT ka, kb, ku,
               len(list_intersect(list_intersect(ku, ka), kb)) AS n_common
        FROM u)
      SELECT ${sqlKmvEst("ka")} AS est_a,
             ${sqlKmvEst("kb")} AS est_b,
             ${sqlKmvEst("ku")} AS est_union,
             CAST(n_common AS BIGINT) AS n_common,
             CAST(n_common AS DOUBLE) / len(ku) * ${sqlKmvEst("ku")}
               AS est_intersection
      FROM c""")),

    // Fixed-iteration BFS (3 hops) from the lowest-id node of the capped
    // co-purchase graph: per hop, frontier ⋈ adjacency then min-dist
    // combine — the iterative-relational BFS whose per-hop cost is one
    // edge-keyed equi-join (never |V|²). Distances are small ints; the
    // oracle unrolls the same three steps as chained CTEs.
    QueryDef("graph_bfs_reach", (s, dir) => {
      // same FrontCache-pinned edge set as graph_triangle_coeff
      val e = CorpusFronts.partCoPurchase(s, dir)
      val adj = e.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(e.select(col("v").as("src"), col("u").as("dst")))
        .cache()
      var dist = e.agg(min(col("u")).as("node"))
        .select(col("node"), lit(0).as("dist"))
      for (i <- 1 to 3) {
        val next = dist.join(adj, col("node") === col("src"))
          .select(col("dst").as("node"), lit(i).as("dist"))
        dist = dist.unionByName(next)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(false)
      }
      dist.orderBy(col("node"))
    }, Some {
      def hop(prev: String, cur: String, i: Int): String = s"""
      $cur AS (
        SELECT node, min(dist) AS dist FROM (
          SELECT node, dist FROM $prev
          UNION ALL
          SELECT adj.dst AS node, $i AS dist
          FROM $prev JOIN adj ON adj.src = $prev.node)
        GROUP BY node)"""
      s"""
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
                  WHERE l_orderkey <= 6000),
      e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                              AND a.l_partkey < b.l_partkey),
      adj AS (SELECT u AS src, v AS dst FROM e
              UNION ALL SELECT v AS src, u AS dst FROM e),
      d0 AS (SELECT min(u) AS node, 0 AS dist FROM e),
      ${hop("d0", "d1", 1)},
      ${hop("d1", "d2", 2)},
      ${hop("d2", "d3", 3)}
      SELECT node, dist FROM d3 ORDER BY node"""
    })
  )
}
