package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte count of a string — the compression-ratio
  * quality signal web-curation pipelines use (highly repetitive or
  * templated text compresses far below natural prose; near-random noise
  * barely compresses). Kept inside whole-stage codegen as one static
  * call per row (ExprOps.deflateLen); the per-row cost is the deflate
  * itself, which no formulation avoids. Not SQL-expressible in the
  * DuckDB oracle → covered by spec + rows-only gate.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ExprOps.deflateLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.expressions.ExprOps.deflateLen($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "deflate_len"
}

object DeflateLen {
  def apply(c: Column): Column = Bridge.column(DeflateLen(Bridge.expression(c)))
}
