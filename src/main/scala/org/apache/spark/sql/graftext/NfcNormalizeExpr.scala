package org.apache.spark.sql.graftext

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) as a native Catalyst expression —
  * Spark ships no normalization builtin, and text dedup/fingerprinting
  * must canonicalize first or `é` (U+00E9) and `é` (e + U+0301) hash as
  * different documents. NFC specifically (not NFKC): canonical
  * equivalences only — compatibility forms like the ﬁ ligature are
  * distinct documents and stay distinct.
  *
  * A codegen'd expression rather than a UDF keeps the call inside
  * whole-stage codegen (no SerDe boundary, no closure dispatch); the
  * static helper takes the `Normalizer.isNormalized` fast path first, so
  * already-NFC text (all ASCII, i.e. most of a web corpus) pays one scan
  * and zero allocation beyond the String view.
  */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftext.NfcNormalizeExpr.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column API: `nfc_normalize(c)` over a string column. */
  def nfcNormalize(c: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(c)))
}
