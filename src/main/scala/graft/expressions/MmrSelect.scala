package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection (Carbonell & Goldstein '98)
  * over a BOUNDED candidate array — the diversity rerank a retrieval or
  * data-selection pipeline runs on an ANN/BM25 candidate set: step 1 takes
  * the most relevant item, every later step takes
  * `argmax λ·rel(c) − μ·max_{s∈selected} cos(c, s)`.
  *
  * Shape: this is a SCALAR expression over one collected candidate array
  * per query (`groupBy(query_id).agg(collect_list(...))` upstream), not a
  * per-corpus-row operator — the candidate set is already top-k-bounded
  * (k ≤ a few dozen), so the O(k²·dim) greedy loop is constant work per
  * query and the whole rerank distributes as one narrow projection over
  * the queries. At 100 TB the corpus never appears here; only the bounded
  * per-query candidate lists do (shuffle O(queries × k × dim)).
  *
  * λ and μ are SEPARATE literals (never derived as `1−λ` — `1.0-0.7` is
  * not the double `0.3` the oracle writes). Ties keep the lowest id;
  * cosines use the engine-standard left-fold dot (see [[ExprOps.mmrSelect]])
  * so marginals are bit-identical to the DuckDB oracle's unrolled
  * `ORDER BY marginal DESC, doc_id LIMIT 1` step chain.
  */
case class MmrSelect(child: Expression, k: Int, lambda: Double, mu: Double)
    extends UnaryExpression {

  require(k > 0, "k must be positive")

  private def vecType: Option[DataType] = child.dataType match {
    case ArrayType(StructType(Array(f0, f1, f2)), _)
        if f0.dataType == LongType && f1.dataType == DoubleType =>
      f2.dataType match {
        case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
        case _ => None
      }
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (vecType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "mmr_select expects array<struct<id:bigint, rel:double, vec:array<float|double>>>, " +
        s"got ${child.dataType}")

  private def isFloat: Boolean = vecType.contains(FloatType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("doc_id", LongType, nullable = false),
    StructField("rel", DoubleType, nullable = false),
    StructField("marginal", DoubleType, nullable = false))), containsNull = false)

  override def nullIntolerant: Boolean = true

  override def nullSafeEval(cands: Any): Any =
    ExprOps.mmrSelect(cands.asInstanceOf[ArrayData], isFloat, k, lambda, mu)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ExprOps.mmrSelect($c, $isFloat, $k, $lambda, $mu)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MmrSelect {
  def apply(cands: Column, k: Int, lambda: Double, mu: Double): Column =
    Bridge.column(MmrSelect(Bridge.expression(cands), k, lambda, mu))
}
