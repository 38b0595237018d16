package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in scaled INTEGER arithmetic.
  *
  * Ranks are maintained as BIGINTs scaled by `Scale` (10¹²) with floor
  * divisions — `rank/outdeg` and the damping factor are integer DIVs, so
  * every iteration is bit-identical regardless of partitioning, join
  * order, or engine (a double formulation would expose float-sum order
  * across partitions). Dangling mass (nodes with no out-edges) is
  * dropped, and floor division sheds at most one scale-unit per edge —
  * both deterministic choices mirrored exactly by the SQL oracle.
  *
  * rank'(v) = ((den−num)·(Scale DIV N)) DIV den
  *          + (num · Σ_{u→v} (rank(u) DIV outdeg(u))) DIV den
  *
  * Scale design: each iteration is one equi-join of the rank table with
  * the edge list plus a hash agg on dst — the standard distributed
  * PageRank step (shuffle bounded by |edges|). The rank table is
  * `localCheckpoint`ed every few iterations to sever lineage — without
  * it each iteration's plan embeds the previous one's and analysis /
  * optimization cost compounds geometrically at real iteration counts
  * (20–50), the same hazard Dedup.components guards against.
  */
object PageRank {

  val Scale = 1000000000000L

  /** `edges` are DIRECTED (src → dst) and must be distinct pairs; pass
    * both directions for an undirected graph. Returns (node, rank).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int, dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampDen > dampNum,
      "need iters ≥ 1 and 0 < dampNum < dampDen")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    // The per-iteration inputs are reused `iters` times — cache them so
    // each round re-reads materialized blocks instead of re-scanning and
    // re-shuffling the edge list. The out-degree is folded INTO the
    // cached edge table once (r10 cost-floor profile: the per-iteration
    // edges⋈outdeg join was ~0.5 s/run at sf0.1 and pure overhead — deg
    // is static) as a COUNT OVER the src-partitioned window (round-16:
    // the previous groupBy + self-join shuffled the edge list twice for
    // the same integer; the window shuffles it once and leaves the
    // cached table hash-partitioned BY src, so each iteration's
    // rank⋈edges equi-join consumes the cached partitioning with no
    // exchange on the edge side), so each iteration is ONE equi-join +
    // one hash agg.
    val ed = e.withColumn("deg", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .cache()
    val nodesC = nodes.cache()
    // node count as a driver literal (ONE bounded scalar — the profile
    // showed the per-iteration broadcast crossJoin + repeated count
    // aggregation of the cached nodes was measurable, the value never
    // changes, and the integer arithmetic is unchanged: Scala Long '/'
    // on positives == floor DIV)
    val nnV = nodesC.count()
    val initRank = Scale / nnV
    val base = (dampDen - dampNum) * (Scale / nnV) / dampDen
    var r = nodesC.select(col("node"), lit(initRank).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = r.join(ed, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank DIV deg")).as("contrib"))
      // localCheckpoint (eager) severs lineage: without it iteration k's
      // plan embeds iteration k−1's and planning cost compounds with
      // depth (the Dedup.components hazard). Superseded checkpoint blocks
      // are reclaimed by the ContextCleaner once unreferenced. (The r10
      // profile measured the checkpoint write at ≤0.3 s/run at sf0.1 —
      // NOT the cost floor; the floor is the fixed graph build + cache
      // materialization, see PLANS.md round-10 exhibit.)
      r = nodesC.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          expr(s"$base + ($dampNum * coalesce(contrib, 0L)) DIV $dampDen")
            .as("rank"))
        .localCheckpoint()
    }
    ed.unpersist(false); nodesC.unpersist(false)
    r
  }
}
