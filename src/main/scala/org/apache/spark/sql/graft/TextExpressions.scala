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

  /** Textbook Jaro-Winkler (prefix scale 0.1, boost threshold 0.7,
    * max prefix 4) over UTF-16 chars — verified value-identical to
    * DuckDB's jaro_winkler_similarity on the q89 oracle. */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString; val b = ub.toString
    if (a == b) return 1.0
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - window)
      val hi = math.min(i + window + 1, l2)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0; var k = 0; i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - half) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPre = math.min(4, math.min(l1, l2))
    while (prefix < maxPre && a.charAt(prefix) == b.charAt(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
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

/** Jaro-Winkler similarity of two string columns — fuzzy matching's
  * other standard metric (levenshtein counts edits; Jaro-Winkler
  * scores transposition-tolerant similarity with a common-prefix
  * boost). Native expression for the same codegen reasons as
  * [[UnicodeNormalize]]. */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextExprUtils.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = org.apache.spark.sql.graft.TextExprUtils
         .jaroWinkler($a, $b);""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  /** Column wrapper for [[UnicodeNormalize]]. */
  def normalize(c: Column, form: String, strip: Boolean = false)
      : Column =
    ExpressionUtils.column(UnicodeNormalize(
      ExpressionUtils.expression(c), form, strip))

  /** Column wrapper for [[JaroWinkler]]. */
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
