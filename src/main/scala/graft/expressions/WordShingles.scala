package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word w-shingles (space-joined runs of w consecutive tokens) as
  * one compiled pass — replaces the interpreted
  * `transform(sequence, slice+array_join)` + `array_distinct` chain that
  * dominated MinHash signature preparation.
  * Semantics identical to the HOF formulation: null tokens → null,
  * fewer than w tokens → empty array, distinct in first-occurrence order.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (array<string>, int), got $l / $r")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val toks = l.asInstanceOf[ArrayData]
    val w = r.asInstanceOf[Int]
    val n = toks.numElements()
    if (w <= 0 || n - w + 1 <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](2 * w - 1)
    var i = 0
    while (i <= n - w) {
      var j = 0
      while (j < w) {
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

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
  */
case class JaccardGeq(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_geq expects (array<string>, array<string>, double), got $a / $b / $c")
    }

  private def jAtLeast(inter: Int, total: Int, t: Double): Boolean = {
    val union = total - inter
    if (union == 0) false // matches jaccard() = 0.0 for two empty arrays
    else inter.toDouble / union.toDouble >= t
  }

  override def nullSafeEval(av: Any, bv: Any, tv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    val t = tv.asInstanceOf[Double]
    val na = a.numElements()
    val nb = b.numElements()
    val total = na + nb
    val maxI = math.min(na, nb)
    // minimal intersection count that satisfies the predicate, found by
    // binary search with the IDENTICAL double test (J monotonic in I) —
    // the merge loop below then needs only integer compares
    var lo = 0; var hi = maxI + 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (jAtLeast(mid, total, t)) hi = mid else lo = mid + 1
    }
    val required = lo // maxI+1 ⇒ unreachable
    if (required == 0) return true
    if (required > maxI) return false
    var i = 0; var j = 0; var m = 0
    while (i < na && j < nb) {
      if (m >= required) return true
      if (m + math.min(na - i, nb - j) < required) return false
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { m += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    m >= required
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object JaccardGeq {
  def apply(aSorted: Column, bSorted: Column, t: Double): Column =
    Bridge.column(JaccardGeq(Bridge.expression(aSorted), Bridge.expression(bSorted),
      Bridge.expression(org.apache.spark.sql.functions.lit(t))))
}
