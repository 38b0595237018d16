package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** F6's forgiving time parse as one compiled pass: returns the
  * seconds-past-midnight for a schedule time string, with the reference's
  * exact rules (extraction_helpers.py:182-196): strip ASCII spaces ONLY
  * (case preserved, periods kept), require a literal uppercase `AM`/`PM`
  * suffix, then accept `h[h][:m[m]]AM|PM` with hour 1–12 and minute 0–59
  * (strptime `%I`/`%M` accept 1–2 digits); anything unparseable → 0 =
  * midnight, matching the reference's fallback Timestamp at date midnight.
  * The composed when/regexp_extract chain evaluated the same regex up to
  * ~8× per row through the CASE tree; this is one scan.
  * Semantics are locked by the FunctionsSpec format table and the
  * f6_schedule_combine oracle (which replicates the RULES, not the
  * implementation). Codegen: one static `ExprOps.parseScheduleTime` call.
  */
case class ParseScheduleTime(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_schedule_time expects string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ExprOps.parseScheduleTime(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.ExprOps.parseScheduleTime($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ParseScheduleTime {
  def apply(c: Column): Column =
    Bridge.column(ParseScheduleTime(Bridge.expression(c)))
}
