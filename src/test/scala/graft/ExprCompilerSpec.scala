package graft

import graft.expr.{ExprCompiler, ExprParser}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ExprCompilerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalOn(expr: String, cols: Map[String, Any]): Any = {
    val fields = cols.map { case (k, v) =>
      val dt = v match {
        case _: Double => DoubleType
        case _: Long => LongType
        case _: Int => IntegerType
        case _: String => StringType
        case null => DoubleType
        case _: java.sql.Timestamp => TimestampType
        case _ => StringType
      }
      StructField(k, dt)
    }.toSeq
    val schema = StructType(fields)
    val row = Row.fromSeq(cols.values.toSeq)
    val df = spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
    val c = ExprCompiler.toNullable(ExprCompiler.compile(expr, schema))
    df.select(c.as("r")).collect()(0).get(0)
  }

  test("arithmetic and precedence") {
    assert(evalOn("1 + 2 * 3", Map("x" -> 0d)) == 7d)
    assert(evalOn("(1 + 2) * 3", Map("x" -> 0d)) == 9d)
    assert(evalOn("2 ^ 3 ^ 2", Map("x" -> 0d)) == 512d) // right-assoc
    assert(evalOn("-2 ^ 2", Map("x" -> 0d)) == -4d) // unary binds looser
    assert(evalOn("7 % 4", Map("x" -> 0d)) == 3d)
    assert(evalOn("x / 4", Map("x" -> 10d)) == 2.5d)
  }

  test("comparisons return 1/0 and chain with logic ops") {
    assert(evalOn("3 > 2", Map("x" -> 0d)) == 1d)
    assert(evalOn("3 < 2", Map("x" -> 0d)) == 0d)
    assert(evalOn("(x > 1) & (x < 5)", Map("x" -> 3d)) == 1d)
    assert(evalOn("x > 1 & x < 5", Map("x" -> 3d)) == 1d) // prec: cmp > &
    assert(evalOn("(x < 1) | (x > 2)", Map("x" -> 3d)) == 1d)
    assert(evalOn("!(x > 1)", Map("x" -> 3d)) == 0d)
    assert(evalOn("if(x > 1, 10, 20)", Map("x" -> 3d)) == 10d)
    assert(evalOn("if(x > 5, 10, 20)", Map("x" -> 3d)) == 20d)
  }

  test("null → NaN propagation → null output (reference eval:243-252)") {
    assert(evalOn("x + 1", Map("x" -> null)) == null)
    // comparisons with NaN are false, Java-style, not Spark NaN-largest
    assert(evalOn("x > 1", Map("x" -> null)) == 0d)
    assert(evalOn("x <= 1", Map("x" -> null)) == 0d)
    assert(evalOn("x != 1", Map("x" -> null)) == 1d)
    assert(evalOn("if(x > 1, 10, 20)", Map("x" -> null)) == 20d)
    assert(evalOn("max(x, 5)", Map("x" -> null)) == null) // Math.max(NaN,·)
    assert(evalOn("min(x, 5)", Map("x" -> null)) == null)
  }

  test("division by zero follows Java double semantics") {
    assert(evalOn("x / 0", Map("x" -> 1d)) == Double.PositiveInfinity)
    assert(evalOn("x / 0", Map("x" -> -1d)) == Double.NegativeInfinity)
    assert(evalOn("x % 0", Map("x" -> 1d)) == null) // NaN → null out
    assert(evalOn("0 / 0", Map("x" -> 1d)) == null)
  }

  test("string and integer fields widen to double") {
    assert(evalOn("x * 2", Map("x" -> 21L)) == 42d)
    assert(evalOn("x * 2", Map("x" -> "21")) == 42d)
    assert(evalOn("x * 2", Map("x" -> "abc")) == null) // unparseable
  }

  test("math functions") {
    assert(evalOn("sqrt(x)", Map("x" -> 16d)) == 4d)
    assert(evalOn("abs(0 - x)", Map("x" -> 3d)) == 3d)
    assert(evalOn("floor(x)", Map("x" -> 3.7)) == 3d)
    assert(evalOn("ceil(x)", Map("x" -> 3.2)) == 4d)
    assert(evalOn("log2(x)", Map("x" -> 8d)) == 3d)
    assert(evalOn("signum(0 - x)", Map("x" -> 5d)) == -1d)
    assert(evalOn("max(min(x, 10), 0)", Map("x" -> 15d)) == 10d)
    assert(evalOn("pi", Map("x" -> 0d)) == math.Pi)
  }

  test("switch function: first matching case wins, default 0") {
    val e = "switch(x > 10, 1, x > 5, 2, x > 0, 3)"
    assert(evalOn(e, Map("x" -> 20d)) == 1d)
    assert(evalOn(e, Map("x" -> 7d)) == 2d)
    assert(evalOn(e, Map("x" -> 1d)) == 3d)
    assert(evalOn(e, Map("x" -> -1d)) == 0d)
  }

  test("timestamp vars read as epoch micros; diff funcs truncate") {
    val ts = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    assert(evalOn("timestamp_diff_day(a, b)",
      Map("a" -> ts, "b" -> t0)) == 1d)
    assert(evalOn("timestamp_diff_hour(a, b)",
      Map("a" -> ts, "b" -> t0)) == 24d)
    assert(evalOn("timestamp_diff_second(a, b)",
      Map("a" -> ts, "b" -> t0)) == 86400d)
    // timestamp_to_date: epoch micros → epoch days
    assert(evalOn("timestamp_to_date(a, 0)",
      Map("a" -> t0)) == 19723d) // 2024-01-01
  }

  test("parser: variables extraction") {
    val ast = ExprParser.parse("a + b[2] * if(c > 0, d, 1)")
    assert(ExprParser.variables(ast) == Set("a", "b", "c", "d"))
  }
}
