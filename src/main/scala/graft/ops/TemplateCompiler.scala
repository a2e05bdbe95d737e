package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Minimal template → Column compiler for the `text` select func and
  * templated paths (reference uses FreeMarker — `util/TemplateUtil.java`;
  * we support the `${field}` interpolation subset, which covers the
  * documented select/text and dynamic-destination examples, and compile
  * it to `concat` so it stays inside codegen instead of calling a
  * template engine per row).
  */
object TemplateCompiler {

  private val Ref = """\$\{([A-Za-z_][\w.]*)\}""".r

  /** Split template into literal / ${ref} parts → concat Column. */
  def compile(template: String, schema: StructType): Column = {
    val parts = split(template).map {
      case Left(litText) => lit(litText)
      case Right(fieldRef) => coalesce(col(fieldRef).cast(StringType), lit(""))
    }
    if (parts.isEmpty) lit("")
    else if (parts.size == 1) parts.head.cast(StringType)
    else concat(parts: _*)
  }

  def split(template: String): Seq[Either[String, String]] = {
    val out = Vector.newBuilder[Either[String, String]]
    var last = 0
    for (m <- Ref.findAllMatchIn(template)) {
      if (m.start > last) out += Left(template.substring(last, m.start))
      out += Right(m.group(1))
      last = m.end
    }
    if (last < template.length) out += Left(template.substring(last))
    out.result()
  }

  def referencedFields(template: String): Seq[String] =
    split(template).collect { case Right(f) => f }
}
