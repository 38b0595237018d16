package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** IVF cell assignment (argmin-L2 over the centroid table) as ONE compiled
  * projection with the centroid MATRIX carried as a reference object — the
  * large-`nlist` replacement for the literal-per-centroid expression tree.
  *
  * The literal form (`array(struct(d₀,cid₀), …)` → `array_min`) embeds
  * nlist × dim constants in the expression: past a few dozen centroids the
  * generated source grows to megabytes and Janino spends tens of seconds
  * compiling it (measured 45 s at nlist=142, data-independent — worse than
  * the job itself), or codegen falls back to interpreted eval. Here the
  * expression tree is O(1): the matrix lives in `references` and the loop
  * is a tight compiled scan — per-row cost O(nlist·dim), no join, no row
  * ids, no shuffle. This is what makes √N-cell SemDeDup assignment viable
  * at corpus scale.
  *
  * Bit-identical to the literal path: per centroid
  * `d = dot(v,v) − 2·dot(v,c) + Σc²` with the same left-to-right double
  * accumulation as [[DotProduct]] and the same Scala left-fold `Σc²`;
  * ties keep the LOWEST centroid id (centroids are iterated in ascending
  * id order with a strict `<`), matching `array_min`'s lexicographic
  * (d, cid) struct ordering. Spec-pinned equality in OperatorsSpec.
  */
case class NearestCentroid(child: Expression, centroids: Seq[(Int, Seq[Double])])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid expects array<float|double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val sorted = centroids.sortBy(_._1)
  @transient private lazy val cents: Array[Array[Double]] =
    sorted.map(_._2.toArray).toArray
  @transient private lazy val ccs: Array[Double] =
    sorted.map(_._2.map(x => x * x).sum).toArray
  @transient private lazy val cids: Array[Int] = sorted.map(_._1).toArray

  override def nullSafeEval(v: Any): Any =
    ExprOps.nearestCentroid(v.asInstanceOf[ArrayData], isFloat, cents, ccs, cids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val ccRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    val cidRef = ctx.addReferenceObj("cids", cids, "int[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.ExprOps.nearestCentroid($v, $isFloat, $centsRef, $ccRef, $cidRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(vec), centroids))
}

/** [[NearestCentroid]]'s distance twin: the MIN squared L2 distance to
  * the centroid table (not the argmin id) — the per-point k-means‖
  * sampling weight, with the same O(1) expression tree and
  * reference-object centroid matrix, so the sampling pass stays one
  * compiled scan at any candidate count.
  */
case class NearestCentroidDist(child: Expression,
                               centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_dist expects array<float|double>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val ccs: Array[Double] =
    centroids.map(_.map(x => x * x).sum).toArray

  override def nullSafeEval(v: Any): Any =
    ExprOps.nearestCentroidDistSq(v.asInstanceOf[ArrayData], isFloat, cents, ccs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val ccRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.ExprOps.nearestCentroidDistSq($v, $isFloat, $centsRef, $ccRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidDist {
  def apply(vec: Column, centroids: Seq[Seq[Double]]): Column =
    Bridge.column(NearestCentroidDist(Bridge.expression(vec), centroids))
}
