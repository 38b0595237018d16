package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-grams of a string (n per-row), as one compiled
  * loop instead of the interpreted `transform(sequence(...), substr)` +
  * `array_distinct` chain — the hot path of the similarity joins.
  *
  * Semantics match the HOF formulation exactly: null string → null,
  * length < n → empty array, else the distinct n-char substrings in
  * first-occurrence order (character = codepoint, like `Column.substr` and
  * DuckDB string slicing). With `sorted = true` the grams come back
  * byte-lexicographically sorted (UTF8String order — identical to
  * `array_sort`'s default comparator) in the same compiled pass, instead
  * of a downstream `array_sort` whose comparator lambda is interpreted
  * per comparison.
  *
  * Generates a static `ExprOps.charNgrams` call, so the enclosing operator
  * stays inside whole-stage codegen (CodegenFallback would evict it).
  */
case class CharNgrams(left: Expression, right: Expression,
                      sorted: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects (string, int), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    ExprOps.charNgrams(l.asInstanceOf[UTF8String], r.asInstanceOf[Int], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"graft.expressions.ExprOps.charNgrams($s, $n, $sorted)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharNgrams {
  def apply(s: Column, n: Column): Column =
    Bridge.column(CharNgrams(Bridge.expression(s), Bridge.expression(n)))

  /** Grams pre-sorted in UTF8String (byte) order — for JaccardGeq inputs. */
  def sorted(s: Column, n: Column): Column =
    Bridge.column(CharNgrams(Bridge.expression(s), Bridge.expression(n),
      sorted = true))
}

/** Count of distinct common elements of two string arrays — the numerator
  * of Jaccard over pre-distinct arrays, as one hash-probe loop per pair
  * instead of interpreted `array_intersect` + `size`. Codegen: one static
  * call per row.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"intersect_count expects (array<string>, array<string>), got $l / $r")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    ExprOps.intersectCount(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.ExprOps.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  def apply(a: Column, b: Column): Column =
    Bridge.column(IntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
