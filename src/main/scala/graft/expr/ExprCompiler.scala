package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles the reference's arithmetic expression DSL to Catalyst
  * `Column`s, preserving its all-double / NaN-as-null semantics
  * (mercari/pipeline `util/ExpressionUtil.java:243-276,277-530`):
  *
  *  - every variable is read as double; null → NaN
  *    (`ExpressionUtil.eval:243-252`)
  *  - timestamps → epoch MICROS, dates → epoch days, time → micros of
  *    day (`ExpressionUtil.getAsDouble:255-276`)
  *  - comparison operators return 1.0/0.0 and follow JAVA NaN rules
  *    (NaN compares false) — NOT Spark's NaN-largest ordering, so every
  *    comparison carries an `isnan` guard
  *  - `if`/`&`/`|`/`!` treat "> 0" as true, with NaN → false
  *  - a NaN result becomes SQL NULL (`ExpressionUtil.eval:250-251`)
  *
  * Compiling (rather than interpreting per-row like the reference's
  * exp4j path) keeps the whole expression inside whole-stage codegen.
  */
object ExprCompiler {
  import ExprParser._

  private val nan = lit(Double.NaN)

  /** Resolve a variable reference to a double-typed Column.
    * `index` is the `field[k]` form (stateful-lag offset or array
    * element — context decides; see SelectCompiler / WindowCompiler). */
  type Resolver = (String, Option[Int]) => Column

  /** Default resolver: schema-aware conversion per getAsDouble.
    * Dotted names resolve through nested structs so e.g. a
    * `window.start` timestamp still converts to epoch micros. */
  def schemaResolver(schema: StructType): Resolver = (name, idx) => {
    def pathType(dt: org.apache.spark.sql.types.DataType,
        parts: List[String]): Option[org.apache.spark.sql.types.DataType] =
      (dt, parts) match {
        case (t, Nil) => Some(t)
        case (s: StructType, p :: rest) =>
          s.find(_.name == p).flatMap(f => pathType(f.dataType, rest))
        case _ => None
      }
    val fieldType = pathType(schema, name.split('.').toList)
    val base = idx match {
      case Some(i) => element_at(col(name), i + 1)
      case None => col(name)
    }
    val elemType = (fieldType, idx) match {
      case (Some(ArrayType(et, _)), Some(_)) => Some(et)
      case (t, _) => t
    }
    toDouble(base, elemType)
  }

  /** Convert a column of the given type to reference double semantics. */
  def toDouble(c: Column, dt: Option[DataType]): Column = {
    val conv = dt match {
      case Some(TimestampType) => unix_micros(c).cast(DoubleType)
      case Some(TimestampNTZType) =>
        unix_micros(c.cast(TimestampType)).cast(DoubleType)
      case Some(DateType) => unix_date(c).cast(DoubleType)
      case _ => c.cast(DoubleType)
    }
    coalesce(conv, nan)
  }

  /** Compile source text → double Column (NaN kept; see toNullable). */
  def compile(expression: String, schema: StructType): Column =
    compile(ExprParser.parse(expression), schemaResolver(schema))

  def compile(ast: Ast, resolve: Resolver): Column = {
    def go(a: Ast): Column = a match {
      case Num(v) => lit(v)
      case Const("pi") | Const("π") => lit(math.Pi)
      case Const("e") => lit(math.E)
      case Const("φ") => lit(1.61803398874d)
      case Const(other) =>
        throw new IllegalArgumentException(s"unknown constant $other")
      case Var(n, i) => resolve(n, i)
      case Unary("-", e) => -go(e)
      case Unary("!", e) => b2d(!truthy(go(e)))
      case Unary(op, _) =>
        throw new IllegalArgumentException(s"unknown unary $op")
      case Bin(op, l, r) => binOp(op, go(l), go(r))
      case Call(fn, args) => call(fn, args.map(go))
    }
    go(ast)
  }

  /** Final form for output/filter use: NaN → NULL (eval:250-251). */
  def toNullable(c: Column): Column = when(!isnan(c), c)

  /** "value > 0" truthiness with Java NaN semantics (NaN → false). */
  def truthy(c: Column): Column = !isnan(c) && (c > lit(0d))

  private def b2d(c: Column): Column = when(c, 1d).otherwise(0d)
  private def anyNan(l: Column, r: Column): Column = isnan(l) || isnan(r)

  private def binOp(op: String, l: Column, r: Column): Column = op match {
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" =>
      // Java double division: x/0 → ±Inf with IEEE zero-sign rules
      // (x/-0.0 flips sign; 0/0 → NaN). Spark's Divide nulls out any
      // zero divisor, so guard explicitly; -0.0 === 0.0 in Spark, so
      // the sign of zero is recovered from the string form (only
      // evaluated in the zero branch).
      val rNegZero = r.cast(StringType).startsWith("-")
      when(r === lit(0d),
        when(isnan(l) || l === lit(0d), nan) // NaN/0 and 0/0 → NaN
          .when((l > 0d && !rNegZero) || (l < 0d && rNegZero),
            lit(Double.PositiveInfinity))
          .otherwise(lit(Double.NegativeInfinity)))
        .otherwise(l / r)
    case "%" =>
      // Java: x % 0 → NaN; Spark Remainder → NULL. Guard.
      when(r === lit(0d), nan).otherwise(l % r)
    case "^" => pow(l, r)
    case "=" => when(anyNan(l, r), 0d).otherwise(b2d(l === r))
    case "!=" => when(anyNan(l, r), 1d).otherwise(b2d(l =!= r))
    case ">" => when(anyNan(l, r), 0d).otherwise(b2d(l > r))
    case ">=" => when(anyNan(l, r), 0d).otherwise(b2d(l >= r))
    case "<" => when(anyNan(l, r), 0d).otherwise(b2d(l < r))
    case "<=" => when(anyNan(l, r), 0d).otherwise(b2d(l <= r))
    case "&" => b2d(truthy(l) && truthy(r))
    case "|" => b2d(truthy(l) || truthy(r))
    case other =>
      throw new IllegalArgumentException(s"unknown operator $other")
  }

  /** Spark's floor/ceil return LONG, collapsing ±Inf/NaN to
    * Long.MinValue/0 — Java's Math.floor/ceil return double and
    * preserve non-finite inputs. */
  private def nonFinitePreserving(a: Column,
      f: Column => Column): Column =
    when(isnan(a) || a === lit(Double.PositiveInfinity) ||
      a === lit(Double.NegativeInfinity), a)
      .otherwise(f(a).cast(DoubleType))

  /** Java Math.log/log10 semantics: 0 → -Infinity, negative/NaN →
    * NaN. Spark's log family nulls both out, so branch on zero before
    * the coalesce-to-NaN fallback. */
  private def logSemantics(a: Column, f: Column => Column): Column =
    when(a === lit(0d), lit(Double.NegativeInfinity))
      .otherwise(coalesce(f(a), nan))

  private val micros: Map[String, Long] = Map(
    "microsecond" -> 1L, "millisecond" -> 1000L, "second" -> 1000000L,
    "minute" -> 60000000L, "hour" -> 3600000000L, "day" -> 86400000000L)

  private def call(fn: String, args: List[Column]): Column = (fn, args) match {
    case ("abs", a :: Nil) => abs(a)
    case ("acos", a :: Nil) => acos(a)
    case ("asin", a :: Nil) => asin(a)
    case ("atan", a :: Nil) => atan(a)
    case ("cbrt", a :: Nil) => cbrt(a)
    case ("ceil", a :: Nil) => nonFinitePreserving(a, ceil)
    case ("cos", a :: Nil) => cos(a)
    case ("cosh", a :: Nil) => cosh(a)
    case ("exp", a :: Nil) => exp(a)
    case ("floor", a :: Nil) => nonFinitePreserving(a, floor)
    // log(0) is -Infinity in Java Math (exp4j semantics); Spark's
    // log returns null there, which would coalesce to NaN
    case ("log", a :: Nil) => logSemantics(a, log)
    case ("log10", a :: Nil) => logSemantics(a, log10)
    case ("log2", a :: Nil) => logSemantics(a, log2)
    case ("sin", a :: Nil) => sin(a)
    case ("sinh", a :: Nil) => sinh(a)
    case ("sqrt", a :: Nil) => sqrt(a)
    case ("tan", a :: Nil) => tan(a)
    case ("tanh", a :: Nil) => tanh(a)
    case ("signum", a :: Nil) => signum(a)
    case ("if", c :: t :: f :: Nil) => when(truthy(c), t).otherwise(f)
    case ("round", a :: s :: Nil) => // parity-plus: HALF_UP rounding
      call_function("round", a, s.cast(IntegerType)).cast(DoubleType)
    case ("round", a :: Nil) =>
      call_function("round", a).cast(DoubleType)
    case ("max", a :: b :: Nil) =>
      when(anyNan(a, b), nan).otherwise(greatest(a, b))
    case ("min", a :: b :: Nil) =>
      when(anyNan(a, b), nan).otherwise(least(a, b))
    case ("timestamp_to_date", ts :: tz :: Nil) =>
      // epoch micros + tz hours → epoch days (TimestampToDateFunction)
      when(isnan(ts) || isnan(tz), nan)
        .otherwise(floor((ts + tz * lit(3600000000d)) / lit(86400000000d))
          .cast(DoubleType))
    case (diff, a :: b :: Nil) if diff.startsWith("timestamp_diff_") =>
      val unit = diff.stripPrefix("timestamp_diff_")
      val k = micros.getOrElse(unit,
        throw new IllegalArgumentException(s"unknown unit $unit"))
      if (k == 1L) a - b
      else when(anyNan(a, b), nan)
        .otherwise(((a - b) / lit(k.toDouble)).cast(LongType)
          .cast(DoubleType))
    case (sw, as) if sw == "switch" || sw.matches("switch\\d+") =>
      // switch(c1,v1,c2,v2,...): first cond > 0 wins, default 0.0
      if (as.size % 2 != 0)
        throw new IllegalArgumentException("switch needs even arg count")
      as.grouped(2).foldRight(lit(0d): Column) {
        case (List(c, v), acc) => when(truthy(c), v).otherwise(acc)
        case (_, acc) => acc
      }
    case (other, as) =>
      throw new IllegalArgumentException(
        s"unknown function $other/${as.size}")
  }
}
