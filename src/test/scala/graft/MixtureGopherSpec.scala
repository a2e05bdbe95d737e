package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Pipeline.ModuleCfg
import graft.operators.{MixtureTransform, TextAnalysisTransform}

/** mixture transform + textAnalysis gopher feature (oracled end-to-end
  * by gates q67/q68; these pin the unit-level contracts). */
class MixtureGopherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mix(params: String,
      inputs: Map[String, org.apache.spark.sql.DataFrame]) =
    MixtureTransform.build(spark,
      ModuleCfg("mix", "mixture", inputs.keys.toSeq, Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      inputs)("mix")

  test("integer weights replicate whole epochs; weight 0 drops; unlisted defaults to 1") {
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("id", "v")
    val b = Seq((3L, "b1")).toDF("id", "v")
    val c = Seq((9L, "c1")).toDF("id", "v")
    val out = mix(
      """{"weights":{"a":2,"c":0},"epochField":"ep","sourceField":"src"}""",
      Map("a" -> a, "b" -> b, "c" -> c))
    val rows = out.select("id", "src", "ep")
      .as[(Long, String, Int)].collect().sorted
    assert(rows.toSeq == Seq((1L, "a", 0), (1L, "a", 1),
      (2L, "a", 0), (2L, "a", 1), (3L, "b", 0)))
  }

  test("fractional epoch is a deterministic strict subset, uncorrelated across inputs") {
    val n = 400
    val df = (1 to n).map(i => (i.toLong, s"d$i")).toDF("id", "v")
    val out = mix(
      """{"weights":{"x":0.5},"keyFields":["id"],"epochField":"ep"}""",
      Map("x" -> df))
    val kept = out.select("id").as[Long].collect().toSet
    assert(kept.size > n / 3 && kept.size < 2 * n / 3) // ~0.5, md5-uniform
    // same config replays the same rows
    val again = mix(
      """{"weights":{"x":0.5},"keyFields":["id"],"epochField":"ep"}""",
      Map("x" -> df)).select("id").as[Long].collect().toSet
    assert(again == kept)
    // a different input name draws a different (uncorrelated) sample
    val other = mix(
      """{"weights":{"y":0.5},"keyFields":["id"],"epochField":"ep"}""",
      Map("y" -> df)).select("id").as[Long].collect().toSet
    assert(other != kept)
  }

  test("fractional weight without keyFields fails actionably") {
    val df = Seq((1L, "a")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      mix("""{"weights":{"x":1.5}}""", Map("x" -> df))
    }
    assert(e.getMessage.contains("keyFields"))
  }

  test("schemas align by name with missing columns null-filled") {
    val a = Seq((1L, "t")).toDF("id", "txt")
    val b = Seq((2L, 7.5)).toDF("id", "score")
    val out = mix("""{"weights":{}}""", Map("a" -> a, "b" -> b))
    assert(out.columns.sorted.toSeq == Seq("id", "score", "txt"))
    val byId = out.collect().map(r => r.getLong(r.fieldIndex("id")) -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("txt")))
  }

  test("streaming input is rejected with an actionable error") {
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
    val e = intercept[IllegalArgumentException] {
      mix("""{"weights":{"s":2}}""", Map("s" -> stream))
    }
    assert(e.getMessage.contains("streaming"))
  }

  private def gopher(params: String,
      docs: org.apache.spark.sql.DataFrame) =
    TextAnalysisTransform.build(spark,
      ModuleCfg("ta", "textAnalysis", Seq("d"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("d" -> docs))("ta")

  test("gopher rules: signals and keep flag on crafted docs") {
    val good = "the quick brown fox jumps over the lazy dog and " +
      "then it runs off to the river bank with great speed today " +
      "because that is what foxes have to be doing all of the time " +
      "when they feel like running far and wide over fields"
    val bullets = "• one item\n• two item\n• three item\nplain tail..."
    val symbols = "# # # # # few words"
    val docs = Seq((1L, good), (2L, bullets), (3L, symbols))
      .toDF("doc_id", "text")
    val out = gopher(
      """{"field":"text","features":["gopher"],"minWords":10}""", docs)
    val m = out.collect().map(r =>
      r.getLong(r.fieldIndex("doc_id")) -> r).toMap

    def d(id: Long, c: String): Double =
      m(id).getDouble(m(id).fieldIndex(c))
    def l(id: Long, c: String): Long =
      m(id).getLong(m(id).fieldIndex(c))
    def b(id: Long): Boolean =
      m(id).getBoolean(m(id).fieldIndex("gopher_keep"))

    // good: all 8 stop words present, alphabetic, no symbols
    assert(l(1L, "gopher_stop_hits") == 8L)
    assert(d(1L, "gopher_symbol_ratio") == 0.0)
    assert(d(1L, "gopher_alpha_ratio") == 1.0)
    assert(b(1L))
    // bullets: 3 of 4 non-blank lines bulleted, 1 ends in ellipsis
    assert(d(2L, "gopher_bullet_ratio") == 0.75)
    assert(d(2L, "gopher_ellipsis_ratio") == 0.25)
    // symbols: 5 '#' over 7 words > 0.1 → rejected
    assert(d(3L, "gopher_symbol_ratio") == 0.714286)
    assert(!b(3L))
  }

  test("gopher thresholds are overridable and default to the paper values") {
    val short = "the dog and the cat have fun with all of that stuff"
    val docs = Seq((1L, short)).toDF("doc_id", "text")
    // default minWords=50 rejects a 12-word doc
    val dflt = gopher("""{"field":"text","features":["gopher"]}""", docs)
    assert(!dflt.collect()(0).getAs[Boolean]("gopher_keep"))
    // lowering the bound admits it
    val low = gopher(
      """{"field":"text","features":["gopher"],"minWords":5}""", docs)
    assert(low.collect()(0).getAs[Boolean]("gopher_keep"))
  }
}
