package graft

import graft.config.Json
import graft.expr.FilterCompiler
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property test: for random condition trees and random rows, the
  * compiled Column predicate must agree with a direct Scala
  * interpretation of the reference's filter semantics
  * (mercari/pipeline `Filter.java:478-541`):
  * null never satisfies any op (except `=`/`!=` vs a null literal);
  * NaN/Inf compare false for every op; array nodes are implicit AND.
  */
class FilterPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // --- model: rows over (a: long, b: double, s: string) ---
  case class R(a: java.lang.Long, b: java.lang.Double, s: String)

  sealed trait Cond
  case class Leaf(key: String, op: String, value: Any) extends Cond
  case class And(cs: List[Cond]) extends Cond
  case class Or(cs: List[Cond]) extends Cond

  // --- reference-semantics interpreter ---
  private def evalLeaf(r: R, l: Leaf): Boolean = {
    val v: Any = l.key match {
      case "a" => r.a
      case "b" => r.b
      case "s" => r.s
    }
    if (v == null) return l.value == null && l.op == "="
    if (l.value == null) return l.op == "!="
    (l.op, v, l.value) match {
      case ("in", _, items: List[_]) =>
        items.map(_.toString).contains(v.toString)
      case ("not in", _, items: List[_]) =>
        !items.map(_.toString).contains(v.toString)
      case ("match", _, p: String) =>
        p.r.findFirstIn(v.toString).isDefined
      case (op, d: java.lang.Double, cmp: Double)
          if d.isNaN || d.isInfinite =>
        false // Filter.java:509-511
      case (op, x, cmp) =>
        val c = (x, cmp) match {
          case (l1: java.lang.Long, c1: Long) => l1.longValue.compare(c1)
          case (d1: java.lang.Double, c1: Double) =>
            d1.doubleValue.compare(c1)
          case (s1: String, c1: String) => s1.compare(c1)
          case _ => 0
        }
        op match {
          case "=" => c == 0
          case "!=" => c != 0
          case ">" => c > 0
          case ">=" => c >= 0
          case "<" => c < 0
          case "<=" => c <= 0
        }
    }
  }

  private def evalCond(r: R, c: Cond): Boolean = c match {
    case l: Leaf => evalLeaf(r, l)
    case And(Nil) | Or(Nil) => false // empty bits → false
    case And(cs) => cs.forall(evalCond(r, _))
    case Or(cs) => cs.exists(evalCond(r, _))
  }

  // --- JSON rendering of the same tree for the compiler ---
  private def lit2json(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s + "\""
    case items: List[_] =>
      items.map(lit2json).mkString("[", ",", "]")
    case other => other.toString
  }
  private def toJson(c: Cond): String = c match {
    case Leaf(k, op, v) =>
      s"""{"key":"$k","op":"$op","value":${lit2json(v)}}"""
    case And(cs) => cs.map(toJson).mkString("""{"and":[""", ",", "]}")
    case Or(cs) => cs.map(toJson).mkString("""{"or":[""", ",", "]}")
  }

  // --- generators ---
  private val genLongLeaf = for {
    op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
    v <- Gen.chooseNum(-5L, 5L)
  } yield Leaf("a", op, v)
  private val genDoubleLeaf = for {
    op <- Gen.oneOf("=", "!=", ">", ">=", "<", "<=")
    v <- Gen.oneOf(-2.5, 0.0, 1.5, 3.0)
  } yield Leaf("b", op, v)
  private val genStrLeaf = for {
    op <- Gen.oneOf("=", "!=", "<", ">", "in", "not in", "match")
    v <- op match {
      case "in" | "not in" =>
        Gen.someOf(List("x", "yy", "z")).map(_.toList)
      case "match" => Gen.oneOf("^x", "y+", "z$")
      case _ => Gen.oneOf("x", "yy", "z")
    }
  } yield Leaf("s", op, v)
  private val genNullLeaf = for {
    k <- Gen.oneOf("a", "b", "s")
    op <- Gen.oneOf("=", "!=")
  } yield Leaf(k, op, null)
  private val genLeaf: Gen[Cond] =
    Gen.oneOf(genLongLeaf, genDoubleLeaf, genStrLeaf, genNullLeaf)

  private def genCond(depth: Int): Gen[Cond] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      3 -> genLeaf,
      1 -> Gen.chooseNum(1, 3)
        .flatMap(n => Gen.listOfN(n, genCond(depth - 1))).map(And(_)),
      1 -> Gen.chooseNum(1, 3)
        .flatMap(n => Gen.listOfN(n, genCond(depth - 1))).map(Or(_)))

  private val genRow: Gen[R] = for {
    a <- Gen.oneOf(Gen.chooseNum(-5L, 5L).map(java.lang.Long.valueOf),
      Gen.const(null: java.lang.Long))
    b <- Gen.oneOf(
      Gen.oneOf(-2.5, 0.0, 1.5, 3.0, Double.NaN,
        Double.PositiveInfinity).map(java.lang.Double.valueOf),
      Gen.const(null: java.lang.Double))
    s <- Gen.oneOf(Gen.oneOf("x", "yy", "z", "xyz"),
      Gen.const(null: String))
  } yield R(a, b, s)

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", DoubleType),
    StructField("s", StringType)))

  test("compiled filter ≡ reference semantics on random trees × rows") {
    val cases = Gen.listOfN(60,
      for { c <- genCond(2); rs <- Gen.listOfN(8, genRow) } yield (c, rs))
      .sample.getOrElse(Nil)
    assert(cases.nonEmpty)
    // batch all (tree, rows) pairs into one Spark job per tree
    cases.zipWithIndex.foreach { case ((cond, rows), i) =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        rows.map(r => Row(r.a, r.b, r.s)).asJava, schema)
      val compiled = FilterCompiler.compile(
        Json.parse(toJson(cond)), schema)
      val got = df.withColumn("__keep",
        org.apache.spark.sql.functions.coalesce(compiled,
          org.apache.spark.sql.functions.lit(false)))
        .collect().map(_.getAs[Boolean]("__keep")).toList
      val exp = rows.map(evalCond(_, cond))
      assert(got == exp,
        s"case $i tree=${toJson(cond)} rows=$rows got=$got exp=$exp")
    }
  }
}
