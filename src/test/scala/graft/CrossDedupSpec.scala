package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Pipeline.ModuleCfg
import graft.operators.DedupTransform

/** Cross-corpus (referenceInput) dedup — oracled end-to-end by q69
  * (minhash); these pin the exact/embedding paths and the guards. */
class CrossDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dedup(params: String,
      inputs: Map[String, org.apache.spark.sql.DataFrame],
      inputOrder: Seq[String]) =
    DedupTransform.build(spark,
      ModuleCfg("dd", "dedup", inputOrder, Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      inputs)("dd")

  test("exact: primary rows matching reference content are flagged with min ref id") {
    val primary = Seq((10L, "alpha beta"), (11L, "unique text"),
      (12L, "gamma delta")).toDF("id", "text")
    val ref = Seq((1L, "alpha beta"), (2L, "gamma delta"),
      (3L, "gamma delta")).toDF("id", "text")
    val out = dedup(
      """{"method":"exact","referenceInput":"ref","idField":"id"}""",
      Map("p" -> primary, "ref" -> ref), Seq("p", "ref"))
    val m = out.select("id", "__dup_of")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m == Map(10L -> Some(1L), 11L -> None, 12L -> Some(2L)))
  }

  test("keep canonical drops matched rows and the marker column") {
    val primary = Seq((10L, "alpha beta"), (11L, "novel")).toDF("id", "text")
    val ref = Seq((1L, "alpha beta")).toDF("id", "text")
    val out = dedup(
      """{"method":"exact","referenceInput":"ref","idField":"id",
         "keep":"canonical"}""",
      Map("p" -> primary, "ref" -> ref), Seq("p", "ref"))
    assert(out.select("id").as[Long].collect().toSeq == Seq(11L))
    assert(!out.columns.contains("__dup_of"))
  }

  test("embedding: bucket join + cosine verify against the reference side") {
    val e1 = Array.tabulate(8)(i => 1.0f / (i + 1))
    val e2 = e1.map(_ * 2.0f) // cosine 1.0 with e1
    val far = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val primary = Seq((10L, e2), (11L, far)).toDF("id", "embedding")
    val ref = Seq((1L, e1)).toDF("id", "embedding")
    val out = dedup(
      """{"method":"embedding","referenceInput":"ref","idField":"id",
         "dim":8,"planes":4,"threshold":0.9}""",
      Map("p" -> primary, "ref" -> ref), Seq("p", "ref"))
    val m = out.select("id", "__dup_of")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m(10L) == Some(1L)) // same direction → same bucket, cos 1.0
    assert(m(11L).isEmpty)
  }

  test("simhash: near-identical text collides with the reference") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val primary = Seq((10L, base + " today"), (11L,
      "entirely different content about completely other topics here"))
      .toDF("id", "text")
    val ref = Seq((1L, base)).toDF("id", "text")
    val out = dedup(
      """{"method":"simhash","referenceInput":"ref","idField":"id"}""",
      Map("p" -> primary, "ref" -> ref), Seq("p", "ref"))
    val m = out.select("id", "__dup_of")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(m(10L) == Some(1L))
    assert(m(11L).isEmpty)
  }

  test("guards: transitive, wrong arity, unsupported method fail actionably") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val e1 = intercept[IllegalArgumentException] {
      dedup("""{"method":"minhash","referenceInput":"ref",
               "transitive":true}""",
        Map("p" -> df, "ref" -> df), Seq("p", "ref"))
    }
    assert(e1.getMessage.contains("transitive"))
    val e2 = intercept[IllegalArgumentException] {
      dedup("""{"method":"minhash","referenceInput":"ref"}""",
        Map("a" -> df, "b" -> df, "ref" -> df), Seq("a", "b", "ref"))
    }
    assert(e2.getMessage.contains("exactly two inputs"))
    val e3 = intercept[IllegalArgumentException] {
      dedup("""{"method":"ngram","referenceInput":"ref"}""",
        Map("p" -> df, "ref" -> df), Seq("p", "ref"))
    }
    assert(e3.getMessage.contains("exact/minhash/simhash/embedding"))
  }

  test("reference-side field overrides map a differently-shaped reference") {
    val primary = Seq((10L, "shared words")).toDF("id", "text")
    val ref = Seq((7L, "shared words")).toDF("ref_id", "content")
    val out = dedup(
      """{"method":"exact","referenceInput":"ref","idField":"id",
         "referenceIdField":"ref_id","referenceField":"content"}""",
      Map("p" -> primary, "ref" -> ref), Seq("p", "ref"))
    val r = out.collect()(0)
    assert(r.getLong(r.fieldIndex("__dup_of")) == 7L)
  }
}
