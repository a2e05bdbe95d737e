package graft.expr

/** Pratt parser for the reference's arithmetic-expression grammar
  * (mercari/pipeline `util/ExpressionUtil.java:36-43,80-111` — an exp4j
  * build with custom comparison/logic operators and if/switch/max/min/
  * timestamp functions). We parse to an AST and compile to Catalyst
  * `Column`s (ExprCompiler) instead of interpreting row-at-a-time.
  *
  * Precedence (binding strength, mirrors exp4j constants):
  *   ^ (right-assoc)            10000
  *   unary -/+                   5000
  *   * / %                       1000
  *   binary + -                   500
  *   = != > >= < <=               499
  *   ! (prefix not)               498
  *   &                            497
  *   |                            496
  */
object ExprParser {

  sealed trait Ast
  case class Num(v: Double) extends Ast
  case class Const(name: String) extends Ast // pi, e, φ
  case class Var(name: String, index: Option[Int]) extends Ast
  case class Unary(op: String, e: Ast) extends Ast // "-", "+", "!"
  case class Bin(op: String, l: Ast, r: Ast) extends Ast
  case class Call(fn: String, args: List[Ast]) extends Ast

  private val constants = Set("pi", "π", "e", "φ")

  def parse(input: String): Ast = new Parser(tokenize(input)).parseAll()

  // ---- lexer ----
  sealed trait Tok
  case class TNum(v: Double) extends Tok
  case class TIdent(s: String) extends Tok
  case class TOp(s: String) extends Tok
  case object TLParen extends Tok
  case object TRParen extends Tok
  case object TLBracket extends Tok
  case object TRBracket extends Tok
  case object TComma extends Tok

  def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val start = i
        while (i < n && (s(i).isDigit || s(i) == '.')) i += 1
        // scientific notation
        if (i < n && (s(i) == 'e' || s(i) == 'E') && i + 1 < n &&
            (s(i + 1).isDigit || ((s(i + 1) == '+' || s(i + 1) == '-') &&
              i + 2 < n && s(i + 2).isDigit))) {
          i += 2
          while (i < n && s(i).isDigit) i += 1
        }
        out += TNum(s.substring(start, i).toDouble)
      } else if (c.isLetter || c == '_' || c == 'π' || c == 'φ') {
        // identifiers may be dotted paths into struct fields (reg.slope)
        val start = i
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_' ||
            s(i) == '.' || s(i) == 'π' || s(i) == 'φ')) i += 1
        out += TIdent(s.substring(start, i))
      } else c match {
        case '(' => out += TLParen; i += 1
        case ')' => out += TRParen; i += 1
        case '[' => out += TLBracket; i += 1
        case ']' => out += TRBracket; i += 1
        case ',' => out += TComma; i += 1
        case '>' | '<' | '!' =>
          if (i + 1 < n && s(i + 1) == '=') { out += TOp(s"$c="); i += 2 }
          else { out += TOp(c.toString); i += 1 }
        case '=' | '+' | '-' | '*' | '/' | '%' | '^' | '&' | '|' =>
          out += TOp(c.toString); i += 1
        case other =>
          throw new IllegalArgumentException(
            s"unexpected char '$other' at $i in: $s")
      }
    }
    out.result()
  }

  private val binPrec: Map[String, Int] = Map(
    "^" -> 10000,
    "*" -> 1000, "/" -> 1000, "%" -> 1000,
    "+" -> 500, "-" -> 500,
    "=" -> 499, "!=" -> 499, ">" -> 499, ">=" -> 499,
    "<" -> 499, "<=" -> 499,
    "&" -> 497, "|" -> 496)

  private class Parser(var toks: List[Tok]) {
    def parseAll(): Ast = {
      val e = parseExpr(0)
      if (toks.nonEmpty)
        throw new IllegalArgumentException(s"trailing tokens: $toks")
      e
    }

    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = {
      val h = toks.head; toks = toks.tail; h
    }
    private def expect(t: Tok): Unit = {
      if (toks.isEmpty || toks.head != t)
        throw new IllegalArgumentException(
          s"expected $t, got ${toks.headOption}")
      toks = toks.tail
    }

    def parseExpr(minPrec: Int): Ast = {
      var lhs = parsePrefix()
      var done = false
      while (!done) {
        peek match {
          case Some(TOp(op)) if binPrec.contains(op) && binPrec(op) >= minPrec =>
            next()
            // right-assoc for ^, left-assoc otherwise
            val nextMin = if (op == "^") binPrec(op) else binPrec(op) + 1
            val rhs = parseExpr(nextMin)
            lhs = Bin(op, lhs, rhs)
          case _ => done = true
        }
      }
      lhs
    }

    private def parsePrefix(): Ast = peek match {
      case Some(TOp("-")) => next(); Unary("-", parseExpr(5000))
      case Some(TOp("+")) => next(); parseExpr(5000)
      case Some(TOp("!")) => next(); Unary("!", parseExpr(498))
      case _ => parsePostfix()
    }

    private def parsePostfix(): Ast = next() match {
      case TNum(v) => Num(v)
      case TLParen =>
        val e = parseExpr(0); expect(TRParen); e
      case TIdent(name) =>
        peek match {
          case Some(TLParen) =>
            next()
            val args = List.newBuilder[Ast]
            if (peek != Some(TRParen)) {
              args += parseExpr(0)
              while (peek == Some(TComma)) { next(); args += parseExpr(0) }
            }
            expect(TRParen)
            Call(name, args.result())
          case Some(TLBracket) =>
            next()
            val idx = next() match {
              case TNum(v) => v.toInt
              case other => throw new IllegalArgumentException(
                s"array index must be integer, got $other")
            }
            expect(TRBracket)
            Var(name, Some(idx))
          case _ =>
            if (constants.contains(name)) Const(name) else Var(name, None)
        }
      case other =>
        throw new IllegalArgumentException(s"unexpected token: $other")
    }
  }

  /** All field names referenced by the expression (array refs collapse
    * to the bare field name — `ExpressionUtil.estimateVariables`). */
  def variables(ast: Ast): Set[String] = ast match {
    case Var(n, _) => Set(n)
    case Unary(_, e) => variables(e)
    case Bin(_, l, r) => variables(l) ++ variables(r)
    case Call(_, args) => args.flatMap(variables).toSet
    case _ => Set.empty
  }
}
