package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Pipeline.ModuleCfg
import graft.operators.DedupTransform

/** Duplicated-substring (span) dedup — oracled end-to-end by q79;
  * these pin the edge semantics the gate's corpus cannot isolate. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(params: String,
      df: org.apache.spark.sql.DataFrame) =
    DedupTransform.build(spark,
      ModuleCfg("dd", "dedup", Seq("in"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> df))("dd")

  private def fracs(out: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    out.select("id", "__dup_span_fraction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("cross-doc shared spans raise the fraction; unique docs stay 0") {
    // docs 1 and 2 share the 3-token span "x y z"; doc 3 is unique
    val df = Seq(
      (1L, "a b x y z"), // spans: "a b x","b x y","x y z" -> 1/3 dup
      (2L, "x y z q r"), // spans: "x y z","y z q","z q r" -> 1/3 dup
      (3L, "u v w s t")).toDF("id", "text")
    val m = fracs(spans(
      """{"method":"spans","field":"text","idField":"id",
         "spanTokens":3,"stride":1}""", df))
    assert(m(1L) === 1.0 / 3.0)
    assert(m(2L) === 1.0 / 3.0)
    assert(m(3L) === 0.0)
  }

  test("within-doc self-repetition alone does not flag a span") {
    val df = Seq(
      (1L, "p q r p q r p q r"), // "p q r" repeats but only in doc 1
      (2L, "entirely different words here")).toDF("id", "text")
    val m = fracs(spans(
      """{"method":"spans","field":"text","idField":"id",
         "spanTokens":3,"stride":1}""", df))
    assert(m(1L) == 0.0 && m(2L) == 0.0)
  }

  test("short and null docs get fraction 0, never flagged") {
    val df = Seq((1L, "too short"), (2L, null.asInstanceOf[String]),
      (3L, "a b c d e"), (4L, "a b c d e")).toDF("id", "text")
    val m = fracs(spans(
      """{"method":"spans","field":"text","idField":"id",
         "spanTokens":5,"stride":1}""", df))
    assert(m(1L) == 0.0 && m(2L) == 0.0)
    assert(m(3L) == 1.0 && m(4L) == 1.0)
  }

  test("stride skips start positions in both inventory and totals") {
    // stride 2 over 6 tokens, span 2: starts at 0,2,4 -> 3 spans
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "c d zz ww qq pp")).toDF("id", "text")
    val m = fracs(spans(
      """{"method":"spans","field":"text","idField":"id",
         "spanTokens":2,"stride":2}""", df))
    // shared span "c d" starts at position 2 in both docs
    assert(m(1L) === 1.0 / 3.0)
    assert(m(2L) === 1.0 / 3.0)
  }

  test("action remove drops docs at/above maxDupFraction") {
    val df = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),
      (3L, "totally unique content here now")).toDF("id", "text")
    val out = spans(
      """{"method":"spans","field":"text","idField":"id",
         "spanTokens":5,"stride":1,"action":"remove",
         "maxDupFraction":0.5}""", df)
    assert(out.columns.toSeq == Seq("id", "text"))
    assert(out.select("id").collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("tokenization splits on the whitespace class, case-sensitive") {
    val df = Seq(
      (1L, "A\tB\nC  D"), // runs of mixed whitespace = one separator
      (2L, "A B C D"),
      (3L, "a b c d")).toDF("id", "text")
    val m = fracs(spans(
      """{"method":"spans","field":"text","idField":"id",
         "spanTokens":4,"stride":1}""", df))
    assert(m(1L) == 1.0 && m(2L) == 1.0)
    assert(m(3L) == 0.0) // lower-case doc shares nothing
  }

  test("streaming input is rejected with the batch-only error") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("value AS id", "CAST(value AS STRING) AS text")
    val e = intercept[IllegalArgumentException](spans(
      """{"method":"spans","field":"text","idField":"id"}""", stream))
    assert(e.getMessage.contains("bounded"))
  }
}
