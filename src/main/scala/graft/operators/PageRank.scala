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
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nn = nodes.agg(count(lit(1)).as("nn"))
    val base =
      s"((${dampDen - dampNum} * ($Scale DIV nn)) DIV $dampDen)"
    // The per-iteration inputs are reused `iters` times — cache them so
    // each round re-reads materialized blocks instead of re-scanning and
    // re-shuffling the edge list.
    val eC = e.cache(); val nodesC = nodes.cache(); val outdegC = outdeg.cache()
    var r = nodesC.crossJoin(broadcast(nn))
      .select(col("node"), expr(s"$Scale DIV nn").as("rank"))
    for (_ <- 1 to iters) {
      val contrib = r.join(eC, col("node") === col("src"))
        .join(outdegC, "src")
        .groupBy(col("dst"))
        .agg(sum(expr("rank DIV deg")).as("contrib"))
      // localCheckpoint (eager) severs lineage: without it iteration k's
      // plan embeds iteration k−1's and planning cost compounds with
      // depth (the Dedup.components hazard). Superseded checkpoint blocks
      // are reclaimed by the ContextCleaner once unreferenced.
      r = nodesC.join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(nn))
        .select(col("node"),
          expr(s"$base + ($dampNum * coalesce(contrib, 0L)) DIV $dampDen")
            .as("rank"))
        .localCheckpoint()
    }
    eC.unpersist(false); nodesC.unpersist(false); outdegC.unpersist(false)
    r
  }
}
