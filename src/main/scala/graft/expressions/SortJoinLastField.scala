package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A6's conversation reassembly tail — `array_sort(collect_list(struct))` →
  * `transform(_.getField(last))` → `array_join(sep)` — fused into one
  * compiled pass per group: sort the struct array with a direct
  * InterpretedOrdering row comparator (array_sort's default comparator is
  * an interpreted lambda evaluated per COMPARISON) and concatenate the
  * last field (the rendered message) with the separator, skipping nulls
  * like array_join.
  *
  * Equivalence caveat (same contract `Convo.sortedStringAgg` already
  * documents): the decisive comparisons must land on the leading order
  * fields — keep them non-null and unique per group. ExpressionsSpec
  * proves bit-identity with the HOF formulation on random data.
  */
case class SortJoinLastField(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(st: StructType, _), StringType)
        if st.nonEmpty && st.last.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "sort_join_last expects (array<struct<..., string>>, string), got " +
        s"$l / $r")
  }

  @transient private lazy val elemType: StructType =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  @transient private lazy val comparator: java.util.Comparator[AnyRef] =
    TypeUtils.getInterpretedOrdering(elemType)
      .asInstanceOf[java.util.Comparator[AnyRef]]

  override def nullSafeEval(l: Any, r: Any): Any =
    ExprOps.sortJoinLast(l.asInstanceOf[ArrayData], r.asInstanceOf[UTF8String],
      comparator, elemType.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ordRef = ctx.addReferenceObj("ord", comparator, "java.util.Comparator")
    val nf = elemType.size
    defineCodeGen(ctx, ev, (arr, sep) =>
      s"graft.expressions.ExprOps.sortJoinLast($arr, $sep, $ordRef, $nf)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortJoinLastField {
  def apply(arr: Column, sep: Column): Column =
    Bridge.column(SortJoinLastField(Bridge.expression(arr), Bridge.expression(sep)))
}
