package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from generated code — one call per row
  * keeps the codegen body a single line (see CosineSimilarity for
  * the extension-bridge rationale of the package). */
object TextExprUtils {
  private val marks = java.util.regex.Pattern.compile("\\p{M}+")

  def normalize(s: UTF8String, form: String, strip: Boolean)
      : UTF8String = {
    val n = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.valueOf(form))
    UTF8String.fromString(
      if (strip) marks.matcher(n).replaceAll("") else n)
  }
}

/** Unicode normalization of a string column (NFC/NFD/NFKC/NFKD),
  * optionally stripping combining marks after NFD/NFKD — the
  * curation-scan text canonicalization step (dedup fingerprints and
  * quality signals diverge on denormalized text). A native
  * expression rather than a UDF so the projection stays inside
  * whole-stage codegen with no encoder round-trip. */
case class UnicodeNormalize(child: Expression, form: String,
    strip: Boolean) extends UnaryExpression
    with ImplicitCastInputTypes with Serializable {

  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"normalize form: $form (valid: NFC, NFD, NFKC, NFKD)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(v: Any): Any =
    TextExprUtils.normalize(v.asInstanceOf[UTF8String], form, strip)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.graft.TextExprUtils
         .normalize($c, "$form", $strip);""")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object TextExpressions {
  /** Column wrapper for [[UnicodeNormalize]]. */
  def normalize(c: Column, form: String, strip: Boolean = false)
      : Column =
    ExpressionUtils.column(UnicodeNormalize(
      ExpressionUtils.expression(c), form, strip))
}
