package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{from_json, udf}
import org.apache.spark.sql.types._

/** `scrape` select func (reference `util/pipeline/select/Scrape.java`
  * — jsoup selectors over an HTML field, `mode: first|repeated`,
  * `attribute`, post-`pattern`+`group`, `trim`, and nested `fields`
  * producing struct / array-of-struct output per matched element,
  * evaluated relative to that element like `Scrape.extract`).
  *
  * jsoup is not on the classpath, so this is a dependency-free
  * selector subset implemented as a tight-loop UDF: simple selectors
  * `tag`, `#id`, `.class`, `tag.class#id` and descendant chains
  * (`div.item a`). Element matching is regex-based over well-formed
  * HTML — nested SAME-TAG elements inside a match are not balanced
  * (documented approximation). Text extraction strips tags, decodes
  * the common entities, and collapses whitespace like jsoup's
  * `text()`.
  */
object ScrapeFunctions extends Serializable {

  case class Selector(tag: Option[String], id: Option[String],
      classes: Seq[String])

  def parseSelector(s: String): Seq[Selector] =
    s.trim.split("\\s+").toSeq.map { part =>
      val m = java.util.regex.Pattern
        .compile("([a-zA-Z][\\w-]*)?((?:[#.][\\w-]+)*)").matcher(part)
      if (!m.matches())
        throw new IllegalArgumentException(s"unsupported selector: $part")
      val tag = Option(m.group(1))
      val quals = Option(m.group(2)).getOrElse("")
      val qualParts = java.util.regex.Pattern.compile("[#.][\\w-]+")
        .matcher(quals)
      var id: Option[String] = None
      val classes = Seq.newBuilder[String]
      while (qualParts.find()) {
        val q = qualParts.group()
        if (q.startsWith("#")) id = Some(q.drop(1))
        else classes += q.drop(1)
      }
      Selector(tag, id, classes.result())
    }

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "source", "track", "wbr")

  /** Compiled-pattern cache: the scrape UDFs run per ROW, and
    * Pattern.compile per row dominated the runtime (~200µs/call
    * measured at sf0.1 — 6× the actual matching work). Keyed on
    * (regex, flags); executor-global and bounded by the distinct
    * selector/tag/attribute vocabulary of the configs. */
  private val patternCache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.regex.Pattern]()
  private def cached(regex: String,
      flags: Int = 0): java.util.regex.Pattern =
    patternCache.computeIfAbsent(s"$flags\u0000$regex",
      _ => java.util.regex.Pattern.compile(regex, flags))
  private val CI = java.util.regex.Pattern.CASE_INSENSITIVE
  private val WsPat = java.util.regex.Pattern.compile("\\s+")

  /** (attrsText, innerHtml) of every element matching one simple
    * selector, in document order. */
  def findElements(html: String, sel: Selector): Seq[(String, String)] = {
    val tagPat = sel.tag.getOrElse("[a-zA-Z][\\w-]*")
    // attrs may contain '>' inside quoted values (title="a > b") —
    // consume quoted runs atomically instead of stopping at any '>'
    val open = cached(
      s"""<($tagPat)\\b((?:[^>"']|"[^"]*"|'[^']*')*)>""", CI)
    val m = open.matcher(html)
    val out = Seq.newBuilder[(String, String)]
    while (m.find()) {
      val tag = m.group(1).toLowerCase(java.util.Locale.ROOT)
      val attrs = m.group(2)
      val matches =
        sel.id.forall(i => attrValue(attrs, "id").contains(i)) &&
          sel.classes.forall(c => attrValue(attrs, "class")
            .exists(v => WsPat.split(v).contains(c)))
      if (matches) {
        val inner =
          if (voidTags.contains(tag) || attrs.trim.endsWith("/")) ""
          else {
            // close tag matched case-insensitively, like the open tag
            val closeM = cached(s"</$tag\\s*>", CI).matcher(html)
            if (closeM.find(m.end)) html.substring(m.end, closeM.start)
            else ""
          }
        out += ((attrs, inner))
      }
    }
    out.result()
  }

  def attrValue(attrs: String, name: String): Option[String] = {
    // (?<![\w-]) anchors the attribute-NAME start: without it `id`
    // matches as a suffix of `data-id` and extracts the wrong value
    val m = cached(
      "(?<![\\w-])" + name + "\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))", CI)
      .matcher(attrs)
    if (m.find()) Option(m.group(2)).orElse(Option(m.group(3)))
      .orElse(Option(m.group(4)))
    else None
  }

  private val ScriptPat =
    java.util.regex.Pattern.compile("(?s)<script.*?</script>")
  private val StylePat =
    java.util.regex.Pattern.compile("(?s)<style.*?</style>")
  private val TagPat = java.util.regex.Pattern.compile("<[^>]*>")

  def textOf(innerHtml: String): String = {
    val noTags = TagPat.matcher(StylePat.matcher(ScriptPat
      .matcher(innerHtml).replaceAll(" ")).replaceAll(" "))
      .replaceAll(" ")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
    WsPat.matcher(noTags).replaceAll(" ").trim
  }

  /** Apply a selector chain: descendant parts walk into innerHtml. */
  def select(html: String, chain: Seq[Selector]): Seq[(String, String)] =
    chain.foldLeft(Seq(("", html))) { (current, sel) =>
      current.flatMap { case (_, inner) => findElements(inner, sel) }
    }

  def scrape(field: Column, selector: String, attribute: Option[String],
      pattern: Option[String], group: Int, repeated: Boolean,
      trimOut: Boolean): Column = {
    val chain = parseSelector(selector)
    val pat = pattern.map(java.util.regex.Pattern.compile)
    def extract(el: (String, String)): Option[String] = {
      val raw = attribute match {
        case Some(a) => attrValue(el._1, a).getOrElse("")
        case None => textOf(el._2)
      }
      val matched = pat match {
        case Some(p) =>
          val m = p.matcher(raw)
          // Option(...): a capture group that did not participate in
          // the match (alternations) returns null from group(n)
          if (m.find()) Option(m.group(math.min(group, m.groupCount())))
          else None
        case None => Some(raw)
      }
      matched.map(v => if (trimOut) v.trim else v)
    }
    if (repeated) {
      val f = udf { (html: String) =>
        if (html == null) Seq.empty[String]
        else select(html, chain).flatMap(extract)
      }
      f(field)
    } else {
      val f = udf { (html: String) =>
        if (html == null) null
        else select(html, chain).flatMap(extract).headOption.orNull
      }
      f(field)
    }
  }

  // --- nested `fields` (Scrape.java:236-258 element-typed output) ---

  /** One scrape node of a nested spec tree. Leaves (no `fields`)
    * extract a string; inner nodes produce a struct whose children
    * are selected WITHIN the matched element's inner HTML. */
  case class Spec(name: String, chain: Seq[Selector],
      attribute: Option[String], pattern: Option[java.util.regex.Pattern],
      group: Int, repeated: Boolean, trim: Boolean, fields: Seq[Spec])

  def parseSpec(node: com.fasterxml.jackson.databind.JsonNode): Spec = {
    import graft.config.Json._
    Spec(
      node.str("name").getOrElse("value"),
      parseSelector(node.str("selector").getOrElse(
        throw new IllegalArgumentException("scrape field requires selector"))),
      node.str("attribute"),
      node.str("pattern").map(java.util.regex.Pattern.compile),
      node.int("group").getOrElse(1),
      node.str("mode").exists(_.equalsIgnoreCase("repeated")),
      node.bool("trim").getOrElse(true),
      node.arrOf("fields").map(parseSpec))
  }

  private def fieldType(s: Spec): DataType =
    if (s.fields.isEmpty) StringType
    else StructType(s.fields.map(f =>
      StructField(f.name, childType(f), nullable = true)))

  private def childType(s: Spec): DataType =
    if (s.repeated) ArrayType(fieldType(s)) else fieldType(s)

  /** Element struct schema of one matched element for `spec`. */
  def structSchema(spec: Spec): StructType =
    StructType(spec.fields.map(f =>
      StructField(f.name, childType(f), nullable = true)))

  private def extractLeaf(el: (String, String), s: Spec): Option[String] = {
    val raw = s.attribute match {
      case Some(a) => attrValue(el._1, a).getOrElse("")
      case None => textOf(el._2)
    }
    val matched = s.pattern match {
      case Some(p) =>
        val m = p.matcher(raw)
        if (m.find()) Option(m.group(math.min(s.group, m.groupCount())))
        else None
      case None => Some(raw)
    }
    matched.map(v => if (s.trim) v.trim else v)
  }

  // @transient lazy: re-initialized after deserialization on each
  // executor (ObjectMapper itself is not Serializable)
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def elementNode(spec: Spec, el: (String, String)):
      com.fasterxml.jackson.databind.node.ObjectNode = {
    val o = mapper.createObjectNode()
    spec.fields.foreach { f =>
      val childEls = select(el._2, f.chain)
      if (f.fields.nonEmpty) {
        if (f.repeated) {
          val a = o.putArray(f.name)
          childEls.foreach(c => a.add(elementNode(f, c)))
        } else childEls.headOption match {
          case Some(c) => o.set[com.fasterxml.jackson.databind.JsonNode](
            f.name, elementNode(f, c))
          case None => o.putNull(f.name)
        }
      } else {
        if (f.repeated) {
          val a = o.putArray(f.name)
          childEls.flatMap(c => extractLeaf(c, f)).foreach(a.add)
        } else childEls.headOption.flatMap(c => extractLeaf(c, f)) match {
          case Some(v) => o.put(f.name, v)
          case None => o.putNull(f.name)
        }
      }
    }
    o
  }

  /** Nested scrape: matched elements → struct (or array of structs in
    * repeated mode). The UDF emits JSON which `from_json` parses with
    * the schema derived from the spec tree — the dynamic-schema
    * bridge, since UDF return types must be known statically. */
  def scrapeStruct(field: Column, spec: Spec): Column = {
    val elemSchema = structSchema(spec)
    val outType: DataType =
      if (spec.repeated) ArrayType(elemSchema) else elemSchema
    val f = udf { (html: String) =>
      if (html == null) null
      else {
        val els = select(html, spec.chain)
        if (spec.repeated) {
          val a = mapper.createArrayNode()
          els.foreach(e => a.add(elementNode(spec, e)))
          mapper.writeValueAsString(a)
        } else els.headOption
          .map(e => mapper.writeValueAsString(elementNode(spec, e)))
          .orNull
      }
    }
    from_json(f(field), outType)
  }
}
