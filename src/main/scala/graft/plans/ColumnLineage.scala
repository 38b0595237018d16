package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}

/** Column-level lineage extraction from the ANALYZED logical plan — the
  * governance question ("which source columns feed this output?") answered
  * statically, before anything runs: walk the plan bottom-up propagating,
  * per attribute, the set of LEAF attributes (table columns) it derives
  * from. Joins/filters/generators pass attribute sets through; projections
  * and aggregates fold each defining expression's references.
  *
  * Deliberately DATA lineage, not control lineage: a filter predicate's
  * columns influence which ROWS survive but define no output column, so
  * they do not appear — the convention of column-lineage tools (OpenLineage
  * field lineage, dbt column lineage).
  *
  * Driver-side plan analysis only — nothing executes, cost is plan size.
  */
object ColumnLineage {

  /** Output column name → source column names qualified as
    * `<leaf>.<column>` where `<leaf>` is the scan's short description
    * (relation or file format + path tail), deduplicated and sorted.
    */
  def of(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val leafOwner = scala.collection.mutable.Map.empty[ExprId, String]
    plan.foreach {
      case l: LeafNode =>
        val label = leafLabel(l)
        l.output.foreach(a => leafOwner(a.exprId) = s"$label.${a.name}")
      case _ =>
    }
    val sources = lineage(plan, leafOwner.toMap)
    df.queryExecution.analyzed.output.map { a =>
      a.name -> sources.getOrElse(a.exprId, Set.empty)
    }.toMap
  }

  private def leafLabel(l: LeafNode): String = {
    val s = l.simpleString(50)
    // "Relation [cols] parquet ...path/table.parquet" → last path segment
    val tail = s.split("[/\\s]").lastOption.getOrElse(l.nodeName)
    tail.replaceAll("[\\]\\[,]", "") match {
      case "" => l.nodeName
      case t  => t
    }
  }

  /** exprId → leaf-column set, computed bottom-up. */
  private def lineage(plan: LogicalPlan,
                      leafOwner: Map[ExprId, String]): Map[ExprId, Set[String]] = {
    val acc = scala.collection.mutable.Map.empty[ExprId, Set[String]]
    leafOwner.foreach { case (id, n) => acc(id) = Set(n) }

    def refsOf(e: Expression): Set[String] =
      e.references.toSeq.flatMap(a => acc.getOrElse(a.exprId, Set.empty)).toSet

    // bottom-up: children first, then this node's defining expressions
    def walk(p: LogicalPlan): Unit = {
      p.children.foreach(walk)
      // Union outputs reuse the FIRST child's exprIds in analyzed plans, so
      // without this the later branches' leaves would silently vanish from
      // lineage — merge every child's same-position column set instead.
      p match {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
          u.output.zipWithIndex.foreach { case (out, i) =>
            val merged = u.children
              .flatMap(c => acc.getOrElse(c.output(i).exprId, Set.empty[String]))
              .toSet
            acc(out.exprId) = acc.getOrElse(out.exprId, Set.empty) ++ merged
          }
        case _ =>
      }
      // any expression that DEFINES an attribute (Alias & friends)
      p.expressions.foreach { e =>
        e.foreach {
          case a: org.apache.spark.sql.catalyst.expressions.Alias =>
            acc(a.exprId) = acc.getOrElse(a.exprId, Set.empty) ++ refsOf(a.child)
          case _ =>
        }
      }
      // attributes passed through untouched keep their sets; attributes
      // produced by generators/aggregates without Alias fall back to the
      // node's full input reference set
      p.output.foreach { a =>
        if (!acc.contains(a.exprId)) {
          val inputs: AttributeSet = p.references
          acc(a.exprId) = inputs.toSeq
            .flatMap(x => acc.getOrElse(x.exprId, Set.empty)).toSet
        }
      }
    }
    walk(plan)
    acc.toMap
  }
}
