package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  */
case class CharNgrams(left: Expression, right: Expression,
                      sorted: Boolean = false)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams expects (string, int), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val s = l.asInstanceOf[UTF8String]
    val n = r.asInstanceOf[Int]
    val bytes = s.getBytes
    // codepoint start offsets (O(len) walk — substringSQL per position
    // would be O(len²))
    val offs = new java.util.ArrayList[Int]()
    var o = 0
    while (o < bytes.length) {
      offs.add(o)
      o += UTF8String.numBytesForFirstByte(bytes(o))
    }
    offs.add(bytes.length)
    val len = offs.size() - 1
    if (n <= 0 || len - n + 1 <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      val from = offs.get(i)
      seen.add(UTF8String.fromBytes(bytes, from, offs.get(i + n) - from))
      i += 1
    }
    val arr = seen.toArray.asInstanceOf[Array[AnyRef]]
    if (sorted) java.util.Arrays.sort(arr,
      (a: AnyRef, b: AnyRef) =>
        a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
    new GenericArrayData(arr)
  }

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
  * instead of interpreted `array_intersect` + `size`.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"intersect_count expects (array<string>, array<string>), got $l / $r")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      set.add(small.getUTF8String(i)); i += 1
    }
    var cnt = 0
    val seen = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < large.numElements()) {
      val e = large.getUTF8String(i)
      if (set.contains(e) && seen.add(e)) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  def apply(a: Column, b: Column): Column =
    Bridge.column(IntersectCount(Bridge.expression(a), Bridge.expression(b)))
}
