package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a compiled expression — the i18n
  * data-cleaning step Spark has no built-in for: visually identical
  * strings with different codepoint sequences (é as U+00E9 vs
  * e + U+0301) hash differently, so exact dedup, group-by keys, and
  * equi-joins silently fragment on un-normalized text. Normalizing at
  * ingest collapses them.
  *
  * Canonical composition (NFC) is fully specified by Unicode, so the
  * JDK normalizer and DuckDB's `nfc_normalize` (utf8proc) produce
  * identical bytes — the oracle is exact. The already-normalized fast
  * path (the overwhelming case on real corpora) is a zero-copy check.
  *
  * Generates a static `ExprOps.nfcNormalize` call, so the enclosing
  * operator stays inside whole-stage codegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ExprOps.nfcNormalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ExprOps.nfcNormalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}

/** Accent stripping (utf8proc STRIPMARK semantics — see
  * [[ExprOps.stripAccents]]): the fuzzy-match normalizer that makes
  * "José" find "Jose" without a Levenshtein pass. Same codegen shape as
  * [[NfcNormalize]]; DuckDB mirror is `strip_accents`.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    ExprOps.stripAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ExprOps.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccents {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge
  def apply(c: Column): Column = Bridge.column(StripAccents(Bridge.expression(c)))
}
