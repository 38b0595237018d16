package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.DoubleType

/** Custom whole-operator path (SURVEY.md §4.3 stretch): top-k-per-probe
  * similarity join.
  *
  * The composed formulation (cross join → score → Window row_number ≤ k)
  * materializes EVERY scored candidate and shuffles them into the window —
  * at scale that is |probes|×|reference| rows through an exchange. This
  * operator keeps the same semantics in one pass: the (small) reference
  * side is collected and broadcast, each probe row maintains a bounded
  * top-k buffer ordered by (score desc, tieBreak asc), and only k rows per
  * probe ever exist. No exchange, no candidate materialization.
  *
  * Semantics (deterministic): emit each probe row joined with its top-k
  * reference rows by score (candidates with score ≤ minScoreExclusive are
  * not candidates at all — probes where everything is filtered emit
  * nothing, matching the reference's phase-1 `score ≠ 0` drop).
  */
case class TopKPerProbe(left: LogicalPlan, right: LogicalPlan,
                        score: Expression, tieBreak: Expression, k: Int,
                        minScoreExclusive: Double,
                        scoreAttr: AttributeReference)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output :+ scoreAttr
  override def producedAttributes: AttributeSet = AttributeSet(scoreAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object TopKPerProbe {
  /** Public API: probe × reference top-k with exact score/tie semantics.
    * The score/tieBreak Columns are resolved against (probes ⨯ reference)
    * through the session analyzer before being planted in the custom node
    * (custom logical operators don't get Column-node resolution for free).
    */
  def join(probes: DataFrame, reference: DataFrame, score: Column,
           tieBreak: Column, k: Int, minScoreExclusive: Double): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.Cross
    import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, Project}
    val spark = probes.sparkSession
    val joinPlan = Join(Bridge.plan(probes), Bridge.plan(reference),
      Cross, None, JoinHint.NONE)
    val probe = Project(Seq(
      Alias(Bridge.sessionExpression(spark, score), "__score")(),
      Alias(Bridge.sessionExpression(spark, tieBreak), "__tie")()), joinPlan)
    val analyzed = Bridge.analyze(spark, probe).asInstanceOf[Project]
    val resolvedJoin = analyzed.child.asInstanceOf[Join]
    val Seq(sAlias, tAlias) = analyzed.projectList
    val node = TopKPerProbe(
      resolvedJoin.left, resolvedJoin.right,
      sAlias.asInstanceOf[Alias].child, tAlias.asInstanceOf[Alias].child, k,
      minScoreExclusive,
      AttributeReference("score", DoubleType, nullable = false)())
    Bridge.ofRows(spark, node)
  }
}

/** Planner strategy registered by GraftExtensions. */
object TopKPerProbeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerProbe(l, r, score, tie, k, minExcl, scoreAttr) =>
      TopKPerProbeExec(planLater(l), planLater(r), score, tie, k, minExcl,
        scoreAttr) :: Nil
    case _ => Nil
  }
}

case class TopKPerProbeExec(left: SparkPlan, right: SparkPlan,
                            score: Expression, tieBreak: Expression, k: Int,
                            minScoreExclusive: Double,
                            scoreAttr: AttributeReference)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output :+ scoreAttr
  override def producedAttributes: AttributeSet = AttributeSet(scoreAttr)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // reference side: collected once, broadcast to every task
    val referenceRows = right.executeCollect().map(_.copy())
    val bcast = sparkContext.broadcast(referenceRows)
    val joinedSchema = left.output ++ right.output
    val boundScore = BindReferences.bindReference(score, joinedSchema)
    val boundTie   = BindReferences.bindReference(tieBreak, joinedSchema)
    val outAttrs = output
    val minExcl = minScoreExclusive
    val kk = k

    left.execute().mapPartitions { probes =>
      val refRows = bcast.value
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val tieOrd = TypeUtils.getInterpretedOrdering(boundTie.dataType)
      probes.flatMap { probe =>
        // bounded top-k buffer: (score desc, tie asc), insertion-stable
        val buf = new java.util.ArrayList[(Double, Any, InternalRow)](kk + 1)
        var ri = 0
        while (ri < refRows.length) {
          val r = refRows(ri)
          joined(probe, r)
          val s = boundScore.eval(joined) match {
            case null      => Double.NegativeInfinity
            case d: Double => d
            case x         => x.toString.toDouble
          }
          if (s > minExcl) {
            val t = boundTie.eval(joined)
            // find insert position: better = higher score, or equal score
            // and smaller tie
            var pos = buf.size()
            var i = 0
            var found = false
            while (i < buf.size() && !found) {
              val (bs, bt, _) = buf.get(i)
              if (s > bs || (s == bs && tieOrd.compare(t, bt) < 0)) {
                pos = i; found = true
              }
              i += 1
            }
            if (pos < kk) {
              buf.add(pos, (s, t, r))
              if (buf.size() > kk) buf.remove(kk)
            }
          }
          ri += 1
        }
        val scoreRow = new GenericInternalRow(1)
        (0 until buf.size()).iterator.map { i =>
          val (s, _, r) = buf.get(i)
          scoreRow.update(0, s)
          proj(new JoinedRow(joined(probe, r), scoreRow)).copy()
        }
      }
    }
  }
}

/** Minimal ordering helper for tie-break values. */
private object TypeUtils {
  def getInterpretedOrdering(dt: org.apache.spark.sql.types.DataType) =
    org.apache.spark.sql.catalyst.util.TypeUtils.getInterpretedOrdering(dt)
}
