package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Distinct word w-shingles (space-joined runs of w consecutive tokens) as
  * one compiled pass — replaces the interpreted
  * `transform(sequence, slice+array_join)` + `array_distinct` chain that
  * dominated MinHash signature preparation.
  * Semantics identical to the HOF formulation: null tokens → null,
  * fewer than w tokens → empty array, distinct in first-occurrence order.
  * Codegen: one static `ExprOps.wordShingles` call per row.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (array<string>, int), got $l / $r")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    ExprOps.wordShingles(l.asInstanceOf[ArrayData], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (toks, w) =>
      s"graft.expressions.ExprOps.wordShingles($toks, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingles {
  def apply(tokens: Column, w: Column): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), Bridge.expression(w)))
}

/** Threshold predicate `jaccard(a, b) >= t` over two SORTED distinct
  * string arrays, as a single merge scan with conservative early exits.
  *
  * Exactness contract: the decisive comparison is always the same double
  * division the scoring expression uses — J = I / (|a|+|b|−I) compared to
  * t — so no boundary case can flip versus the oracle. Early exits only
  * fire when the bound (computed with that identical division) already
  * decides the outcome; J is monotonic in I, which makes them safe.
  * Codegen: one static `ExprOps.jaccardGeq` call per pair, keeping the
  * join stage it gates inside whole-stage codegen.
  */
case class JaccardGeq(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_geq expects (array<string>, array<string>, double), got $a / $b / $c")
    }

  override def nullSafeEval(av: Any, bv: Any, tv: Any): Any =
    ExprOps.jaccardGeq(av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData],
      tv.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, t) =>
      s"graft.expressions.ExprOps.jaccardGeq($a, $b, $t)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object JaccardGeq {
  def apply(aSorted: Column, bSorted: Column, t: Double): Column =
    Bridge.column(JaccardGeq(Bridge.expression(aSorted), Bridge.expression(bSorted),
      Bridge.expression(org.apache.spark.sql.functions.lit(t))))
}
