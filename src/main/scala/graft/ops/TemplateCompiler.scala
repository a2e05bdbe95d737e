package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, StringType, StructType}

/** Template → Column compiler for the `text` select func, the text
  * sink, and templated storage destinations. The reference renders
  * FreeMarker per record (`util/TemplateUtil.java`, `TextSink.java`);
  * here the template compiles ONCE to a Catalyst expression tree —
  * `concat`/`when`/`transform` — so rendering stays inside codegen
  * with no per-row engine calls.
  *
  * Supported surface (the reference's documented template usage):
  * - `${field}` / `${a.b.c}` interpolation (null renders empty)
  * - builtins: `${f?upper_case}` `?lower_case` `?trim` `?length`
  *   `?c` (no-locale render) `?string("fmt")` (date_format pattern)
  * - `<#if cond> … <#elseif cond> … <#else> … </#if>` with `==` `!=`
  *   `gt/gte/lt/lte` (and `>` `>=` `<` `<=`), `&&` `||` `!`,
  *   parentheses, `field??` (is-present), string/number/boolean
  *   literals
  * - `<#list arr as x> … ${x} … </#list>` over array columns
  *   (compiles to `transform` + `array_join`)
  *
  * Deviations (documented in README): plain `${number}` renders in
  * Spark's cast-to-string form, not FreeMarker's locale-grouped form
  * (use `?c` semantics by default, which is what pipelines want);
  * `<#assign>`, macros, and arbitrary `${a + b}` arithmetic are not
  * supported and raise at compile time.
  */
object TemplateCompiler {

  // ----- AST ------------------------------------------------------

  private sealed trait Node
  private case class Text(s: String) extends Node
  private case class Interp(ref: String, builtins: Seq[(String, Option[String])])
    extends Node
  private case class If(branches: Seq[(Cond, Seq[Node])],
      elseBody: Option[Seq[Node]]) extends Node
  private case class ForList(ref: String, varName: String,
      body: Seq[Node]) extends Node

  private sealed trait Cond
  private case class Cmp(ref: String, op: String, value: Lit) extends Cond
  private case class Present(ref: String) extends Cond
  private case class Truthy(ref: String) extends Cond
  private case class And(l: Cond, r: Cond) extends Cond
  private case class Or(l: Cond, r: Cond) extends Cond
  private case class Not(c: Cond) extends Cond

  private sealed trait Lit
  private case class SLit(v: String) extends Lit
  private case class NLit(v: Double) extends Lit
  private case class BLit(v: Boolean) extends Lit
  private case class RefLit(ref: String) extends Lit

  // ----- public API -----------------------------------------------

  /** Compile a template to a single string Column. */
  def compile(template: String, schema: StructType): Column =
    compileNodes(parse(template), Map.empty)

  /** Every field referenced anywhere in the template (interpolations,
    * conditions, list sources) — loop variables excluded. Drives the
    * "is this a dynamic destination" check in the storage sink. */
  def referencedFields(template: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    def walkCond(c: Cond): Unit = c match {
      case Cmp(r, _, v) =>
        out += r
        v match { case RefLit(r2) => out += r2; case _ => }
      case Present(r) => out += r
      case Truthy(r) => out += r
      case And(l, r) => walkCond(l); walkCond(r)
      case Or(l, r) => walkCond(l); walkCond(r)
      case Not(c2) => walkCond(c2)
    }
    def walk(nodes: Seq[Node], loopVars: Set[String]): Unit =
      nodes.foreach {
        case Text(_) => ()
        case Interp(r, _) =>
          if (!loopVars.contains(r.split('.').head)) out += r
        case If(branches, e) =>
          branches.foreach { case (c, b) => walkCond(c); walk(b, loopVars) }
          e.foreach(walk(_, loopVars))
        case ForList(r, v, b) =>
          if (!loopVars.contains(r.split('.').head)) out += r
          walk(b, loopVars + v)
      }
    walk(parse(template), Set.empty)
    out.result().distinct
  }

  // ----- parser ----------------------------------------------------

  private val InterpRe =
    """\$\{([A-Za-z_][\w.]*)((?:\?[a-z_]+(?:\("[^"]*"\))?)*)\}""".r
  private val BuiltinRe = """\?([a-z_]+)(?:\("([^"]*)"\))?""".r

  private def parse(template: String): Seq[Node] = {
    val (nodes, rest) = parseNodes(template, 0, Nil)
    require(rest >= template.length,
      s"template: unexpected directive at ...${template.drop(rest).take(30)}")
    nodes
  }

  /** Parse until a closing/branch directive (returned unconsumed). */
  private def parseNodes(t: String, from: Int, stops: Seq[String])
      : (Seq[Node], Int) = {
    val out = Vector.newBuilder[Node]
    var pos = from
    while (pos < t.length) {
      val dollar = t.indexOf("${", pos)
      val hash = t.indexOf("<#", pos)
      val close = t.indexOf("</#", pos)
      val next = Seq(dollar, hash, close).filter(_ >= 0)
        .sorted.headOption.getOrElse(-1)
      if (next < 0) {
        out += Text(t.substring(pos)); pos = t.length
      } else {
        if (next > pos) out += Text(t.substring(pos, next))
        if (stops.exists(s => t.startsWith(s, next)))
          return (out.result(), next)
        if (next == dollar) {
          InterpRe.findPrefixMatchOf(t.substring(next)) match {
            case Some(m) =>
              val builtins = BuiltinRe.findAllMatchIn(
                Option(m.group(2)).getOrElse(""))
                .map(b => (b.group(1), Option(b.group(2)))).toSeq
              out += Interp(m.group(1), builtins)
              pos = next + m.end
            case None => throw new IllegalArgumentException(
              "template: cannot parse interpolation at ..." +
                t.substring(next).take(30) + " (only ${field} with " +
                "optional ?builtins is supported, not arithmetic)")
          }
        } else if (t.startsWith("<#if ", next)) {
          val (node, after) = parseIf(t, next)
          out += node; pos = after
        } else if (t.startsWith("<#list ", next)) {
          val (node, after) = parseList(t, next)
          out += node; pos = after
        } else throw new IllegalArgumentException(
          s"template: unsupported directive at ...${t.substring(next).take(30)}")
      }
    }
    (out.result(), pos)
  }

  /** Directive-closing '>': skips string literals, '>' inside parens
    * and '>=' — FreeMarker's own rule (bare `a > b` at depth 0 needs
    * `gt` or parentheses, exactly as in FreeMarker). */
  private def directiveEnd(t: String, from: Int): Int = {
    var i = from
    var depth = 0
    var inStr = false
    while (i < t.length) {
      val ch = t.charAt(i)
      if (inStr) { if (ch == '"') inStr = false }
      else ch match {
        case '"' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '>' if depth == 0 &&
            (i + 1 >= t.length || t.charAt(i + 1) != '=') => return i
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(
      s"template: unterminated directive at ${t.drop(from).take(30)}")
  }

  private def parseIf(t: String, start: Int): (Node, Int) = {
    var pos = start
    val branches = Vector.newBuilder[(Cond, Seq[Node])]
    var elseBody: Option[Seq[Node]] = None
    var kw = "<#if "
    var open = true
    while (open) {
      if (kw != null) {
        val condEnd = directiveEnd(t, pos)
        val cond = parseCond(t.substring(pos + kw.length, condEnd))
        val (body, after) = parseNodes(t, condEnd + 1,
          Seq("<#elseif ", "<#else>", "</#if>"))
        branches += ((cond, body))
        pos = after
      }
      if (t.startsWith("<#elseif ", pos)) kw = "<#elseif "
      else if (t.startsWith("<#else>", pos)) {
        val (body, after) = parseNodes(t, pos + "<#else>".length,
          Seq("</#if>"))
        elseBody = Some(body)
        pos = after
        kw = null
      } else if (t.startsWith("</#if>", pos)) {
        pos += "</#if>".length
        open = false
      } else throw new IllegalArgumentException(
        "template: unterminated <#if> (expected </#if>)")
    }
    (If(branches.result(), elseBody), pos)
  }

  private def parseList(t: String, start: Int): (Node, Int) = {
    val hdrEnd = directiveEnd(t, start)
    val hdr = t.substring(start + "<#list ".length, hdrEnd).trim
    val m = """([A-Za-z_][\w.]*)\s+as\s+([A-Za-z_]\w*)""".r
      .findFirstMatchIn(hdr).getOrElse(
        throw new IllegalArgumentException(
          s"template: cannot parse <#list $hdr> (expected 'arr as x')"))
    val (body, after) = parseNodes(t, hdrEnd + 1, Seq("</#list>"))
    require(t.startsWith("</#list>", after),
      "template: unterminated <#list> (expected </#list>)")
    (ForList(m.group(1), m.group(2), body), after + "</#list>".length)
  }

  // condition grammar: or ← and ('||' and)*; and ← unary ('&&' unary)*
  private def parseCond(s: String): Cond = {
    val (c, rest) = parseOr(s.trim)
    require(rest.trim.isEmpty, s"template: trailing condition text '$rest'")
    c
  }

  private def parseOr(s: String): (Cond, String) = {
    var (l, rest) = parseAnd(s)
    while (rest.trim.startsWith("||")) {
      val (r, rest2) = parseAnd(rest.trim.drop(2))
      l = Or(l, r); rest = rest2
    }
    (l, rest)
  }

  private def parseAnd(s: String): (Cond, String) = {
    var (l, rest) = parseUnary(s)
    while (rest.trim.startsWith("&&")) {
      val (r, rest2) = parseUnary(rest.trim.drop(2))
      l = And(l, r); rest = rest2
    }
    (l, rest)
  }

  private def parseUnary(s0: String): (Cond, String) = {
    val s = s0.trim
    if (s.startsWith("!")) {
      val (c, rest) = parseUnary(s.drop(1))
      (Not(c), rest)
    } else if (s.startsWith("(")) {
      val (c, rest) = parseOr(s.drop(1))
      val r = rest.trim
      require(r.startsWith(")"), s"template: expected ')' at '$r'")
      (c, r.drop(1))
    } else parsePrimary(s)
  }

  private val RefRe = """^([A-Za-z_][\w.]*)""".r
  private val OpRe = """^(==|!=|>=|<=|>|<|gte|lte|gt|lt)""".r

  private def parsePrimary(s0: String): (Cond, String) = {
    val s = s0.trim
    val m = RefRe.findFirstMatchIn(s).getOrElse(
      throw new IllegalArgumentException(
        s"template: expected a field reference at '$s'"))
    val ref = m.group(1)
    var rest = s.substring(m.end)
    if (rest.startsWith("??")) return (Present(ref), rest.drop(2))
    val r = rest.trim
    OpRe.findFirstMatchIn(r) match {
      case None => (Truthy(ref), rest)
      case Some(op) =>
        val (value, rest2) = parseLit(r.substring(op.end).trim)
        (Cmp(ref, op.group(1), value), rest2)
    }
  }

  private def parseLit(s: String): (Lit, String) = {
    if (s.startsWith("\"")) {
      val e = s.indexOf('"', 1)
      require(e > 0, s"template: unterminated string literal '$s'")
      (SLit(s.substring(1, e)), s.substring(e + 1))
    } else if (s.startsWith("true")) (BLit(true), s.drop(4))
    else if (s.startsWith("false")) (BLit(false), s.drop(5))
    else {
      val m = """^-?\d+(\.\d+)?""".r.findFirstMatchIn(s).getOrElse(
        RefRe.findFirstMatchIn(s).map { rm =>
          return (RefLit(rm.group(1)), s.substring(rm.end))
        }.getOrElse(throw new IllegalArgumentException(
          s"template: expected a literal at '$s'")))
      (NLit(m.group(0).toDouble), s.substring(m.end))
    }
  }

  // ----- compiler --------------------------------------------------

  private def valueCol(ref: String, env: Map[String, Column]): Column = {
    val parts = ref.split('.')
    val base = env.getOrElse(parts.head, col(parts.head))
    parts.tail.foldLeft(base)(_.getField(_))
  }

  private def renderInterp(n: Interp, env: Map[String, Column]): Column = {
    var c = valueCol(n.ref, env)
    n.builtins.foreach {
      case ("upper_case", _) => c = upper(c)
      case ("lower_case", _) => c = lower(c)
      case ("trim", _) => c = trim(c)
      case ("length", _) => c = length(c.cast(StringType))
      case ("c", _) => c = c.cast(StringType)
      case ("string", Some(fmt)) => c = date_format(c, fmt)
      case ("string", None) => c = c.cast(StringType)
      case (other, _) => throw new IllegalArgumentException(
        s"template: builtin ?$other not supported (upper_case, " +
          "lower_case, trim, length, c, string)")
    }
    coalesce(c.cast(StringType), lit(""))
  }

  private def condCol(c: Cond, env: Map[String, Column]): Column = c match {
    case Present(r) => valueCol(r, env).isNotNull
    case Truthy(r) => coalesce(valueCol(r, env).cast(BooleanType), lit(false))
    case And(l, r) => condCol(l, env) && condCol(r, env)
    case Or(l, r) => condCol(l, env) || condCol(r, env)
    case Not(x) => !condCol(x, env)
    case Cmp(r, op, v) =>
      val refc = valueCol(r, env)
      val (lc, rc) = v match {
        case SLit(s) => (refc.cast(StringType), lit(s))
        case NLit(n) => (refc.cast(DoubleType), lit(n))
        case BLit(b) => (refc.cast(BooleanType), lit(b))
        case RefLit(r2) => (refc, valueCol(r2, env))
      }
      op match {
        case "==" => lc === rc
        case "!=" => lc =!= rc
        case ">" | "gt" => lc > rc
        case ">=" | "gte" => lc >= rc
        case "<" | "lt" => lc < rc
        case "<=" | "lte" => lc <= rc
      }
  }

  private def compileNodes(nodes: Seq[Node],
      env: Map[String, Column]): Column = {
    val parts: Seq[Column] = nodes.map {
      case Text(s) => lit(s)
      case n: Interp => renderInterp(n, env)
      case If(branches, elseBody) =>
        val start = when(condCol(branches.head._1, env),
          compileNodes(branches.head._2, env))
        val chained = branches.tail.foldLeft(start) { case (acc, (c, b)) =>
          acc.when(condCol(c, env), compileNodes(b, env))
        }
        chained.otherwise(
          elseBody.map(compileNodes(_, env)).getOrElse(lit("")))
      case ForList(ref, varName, body) =>
        // coalesce: a NULL array would null the whole concat through
        // array_join — a null list renders empty like every other
        // null in templates
        coalesce(array_join(
          transform(valueCol(ref, env),
            x => compileNodes(body, env + (varName -> x))), ""), lit(""))
    }
    if (parts.isEmpty) lit("")
    else if (parts.size == 1) parts.head.cast(StringType)
    else concat(parts: _*)
  }
}
