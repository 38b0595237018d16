package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** J8's fuzzy best-match (`process.extractOne` over the 69-name
  * serviceable list, `utils/geocode_utils.py:16-28`) as ONE compiled
  * projection: the whole max-ratio loop runs per input row against a
  * constant broadcast-in-bytecode name array.
  *
  * This replaces the crossJoin(×69) → levRatio → groupBy(max) plan shape:
  * no row expansion and no re-shuffle of the expanded frame — at 100 TB the
  * fuzzy tag becomes a narrow map stage. Per-pair math is bit-identical to
  * SimFns.levRatio (UTF8String.levenshteinDistance = the builtin
  * `levenshtein`), so the DuckDB `greatest(ratio…)` oracle still matches
  * exactly. Empty name list → -Infinity (never ≥ threshold).
  */
case class MaxLevRatio(child: Expression, names: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"max_lev_ratio expects string, got ${child.dataType}")

  @transient private lazy val nameArr: Array[UTF8String] =
    names.map(UTF8String.fromString).toArray

  override def nullSafeEval(v: Any): Any =
    ExprOps.maxLevRatio(v.asInstanceOf[UTF8String], nameArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arrRef = ctx.addReferenceObj("names", nameArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, s =>
      s"graft.expressions.ExprOps.maxLevRatio($s, $arrRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxLevRatio {
  def apply(c: Column, names: Seq[String]): Column =
    Bridge.column(MaxLevRatio(Bridge.expression(c), names))
}
