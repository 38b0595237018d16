package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Document fingerprint: rolling polynomial hash over a token array
  * (reference shape: a per-document content signature for cheap
  * change detection). The HOF formulation
  * (`aggregate(transform(...))`) evaluates an interpreted lambda per
  * token — this expression is one static compiled loop per row
  * (ExprOps.rollingFingerprint), bit-identical by construction and by
  * ExpressionsSpec.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ExprOps.rollingFingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, toks =>
      s"graft.expressions.ExprOps.rollingFingerprint($toks)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "rolling_fingerprint"
}

object RollingFingerprint {
  def apply(tokens: Column): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(tokens)))
}
