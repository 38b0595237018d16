package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking boundaries (FastCDC/rsync family, reduced to
  * its deterministic core): chunk START offsets chosen by a rolling
  * content hash, so an insertion early in a document shifts only the
  * chunks it touches — unlike fixed-size chunking, where every later
  * chunk changes. That stability is what makes chunk-level dedup across
  * near-identical documents (boilerplate pages, versioned files) work in
  * a training-data pipeline.
  *
  * One static call per row inside whole-stage codegen (see
  * [[ExprOps.cdcStarts]] for the exact boundary rule); expected chunk
  * length ≈ `modulus` codepoints. Narrow — no shuffle; callers explode
  * the starts array into (chunk_idx, substring) rows.
  */
case class CdcChunkStarts(child: Expression, window: Int, modulus: Int)
    extends UnaryExpression {

  require(window > 0 && modulus > 1, "window must be > 0 and modulus > 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunk_starts expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ExprOps.cdcStarts(input.asInstanceOf[UTF8String], window, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.expressions.ExprOps.cdcStarts($s, $window, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunk_starts"
}

object CdcChunkStarts {
  def apply(c: Column, window: Int = 4, modulus: Int = 64): Column =
    Bridge.column(CdcChunkStarts(Bridge.expression(c), window, modulus))
}
