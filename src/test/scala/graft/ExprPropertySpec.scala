package graft

import graft.expr.{ExprCompiler, ExprParser}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the compiled expression Column agrees with a direct
  * Scala double interpreter of the reference's exp4j semantics
  * (ExpressionUtil.java): all-double, null→NaN, Java comparison rules,
  * truthiness = "> 0 and not NaN", final NaN → null. */
class ExprPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import ExprParser._

  // reference-semantics interpreter over a variable map
  private def interp(a: Ast, env: Map[String, Double]): Double = a match {
    case Num(v) => v
    case Const("pi") | Const("π") => math.Pi
    case Const("e") => math.E
    case Const(_) => 1.61803398874
    case Var(n, _) => env(n)
    case Unary("-", e) => -interp(e, env)
    case Unary("!", e) =>
      val v = interp(e, env); if (v > 0) 0d else 1d // NaN>0 false → 1
    case Unary(_, _) => Double.NaN
    case Bin(op, l, r) =>
      val (x, y) = (interp(l, env), interp(r, env))
      op match {
        case "+" => x + y
        case "-" => x - y
        case "*" => x * y
        case "/" => x / y
        case "%" => x % y
        case "^" => math.pow(x, y)
        case "=" => if (x == y) 1d else 0d
        case "!=" => if (x != y) 1d else 0d
        case ">" => if (x > y) 1d else 0d
        case ">=" => if (x >= y) 1d else 0d
        case "<" => if (x < y) 1d else 0d
        case "<=" => if (x <= y) 1d else 0d
        case "&" => if (x > 0 && y > 0) 1d else 0d
        case "|" => if (x > 0 || y > 0) 1d else 0d
      }
    case Call(fn, args) =>
      val vs = args.map(interp(_, env))
      (fn, vs) match {
        case ("abs", List(v)) => math.abs(v)
        case ("sqrt", List(v)) => math.sqrt(v)
        case ("floor", List(v)) => math.floor(v)
        case ("ceil", List(v)) => math.ceil(v)
        case ("exp", List(v)) => math.exp(v)
        case ("log", List(v)) => math.log(v)
        case ("if", List(c, t, f)) => if (c > 0) t else f
        case ("max", List(x, y)) => math.max(x, y)
        case ("min", List(x, y)) => math.min(x, y)
        case _ => Double.NaN
      }
  }

  private val genLeafE: Gen[Ast] = Gen.oneOf(
    Gen.chooseNum(-4, 4).map(n => Num(n.toDouble)),
    Gen.oneOf("x", "y", "z").map(Var(_, None)))

  private def genExpr(depth: Int): Gen[Ast] =
    if (depth <= 0) genLeafE
    else Gen.frequency(
      2 -> genLeafE,
      4 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "=", "!=", ">", ">=",
          "<", "<=", "&", "|")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Bin(op, l, r)),
      1 -> genExpr(depth - 1).map(Unary("-", _)),
      1 -> genExpr(depth - 1).map(Unary("!", _)),
      2 -> (for {
        fn <- Gen.oneOf("abs", "sqrt", "floor", "log", "if", "max", "min")
        e1 <- genExpr(depth - 1); e2 <- genExpr(depth - 1)
        e3 <- genExpr(depth - 1)
      } yield fn match {
        case "if" => Call("if", List(e1, e2, e3))
        case "max" | "min" => Call(fn, List(e1, e2))
        case f => Call(f, List(e1))
      }))

  private val genEnv: Gen[Map[String, java.lang.Double]] = for {
    x <- Gen.oneOf[java.lang.Double](-2.0, 0.0, 1.0, 3.5, null)
    y <- Gen.oneOf[java.lang.Double](-1.0, 0.5, 2.0, null)
    z <- Gen.oneOf[java.lang.Double](0.0, 4.0, -3.0, null)
  } yield Map("x" -> x, "y" -> y, "z" -> z)

  private val schema = StructType(Seq("x", "y", "z").map(
    StructField(_, DoubleType)))

  test("compiled expression ≡ reference double semantics") {
    val cases = Gen.listOfN(50,
      for { e <- genExpr(3); env <- genEnv } yield (e, env))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    import scala.jdk.CollectionConverters._
    cases.zipWithIndex.foreach { case ((ast, env), i) =>
      val df = spark.createDataFrame(
        List(Row(env("x"), env("y"), env("z"))).asJava, schema)
      val compiled = ExprCompiler.toNullable(
        ExprCompiler.compile(ast, ExprCompiler.schemaResolver(schema)))
      val got = df.select(compiled.as("r")).collect()(0)
      val gotV: java.lang.Double =
        if (got.isNullAt(0)) null else got.getDouble(0)
      val envD = env.map { case (k, v) =>
        k -> (if (v == null) Double.NaN else v.doubleValue)
      }
      val expRaw = interp(ast, envD)
      val expV: java.lang.Double =
        if (expRaw.isNaN) null else expRaw
      val ok = (gotV == null && expV == null) ||
        (gotV != null && expV != null &&
          (gotV.doubleValue == expV.doubleValue ||
            math.abs(gotV - expV) < 1e-9))
      assert(ok, s"case $i ast=$ast env=$env got=$gotV exp=$expV")
    }
  }
}
