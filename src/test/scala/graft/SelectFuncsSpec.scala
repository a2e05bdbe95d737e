package graft

import graft.config.Json
import graft.ops.{HttpFunctions, SelectCompiler}
import org.scalatest.funsuite.AnyFunSuite

class SelectFuncsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("http select func with injected client") {
    HttpFunctions.client = HttpFunctions.EchoClient
    try {
      val df = Seq((1L, "svc-a"), (2L, "svc-b")).toDF("id", "svc")
      val out = SelectCompiler(df, Json.parse(
        """[
          {"name": "id"},
          {"name": "body", "func": "http",
           "text": "http://internal/${svc}/info"}
        ]"""))
      val rows = out.as[(Long, String)].collect().toMap
      assert(rows(1L) == "echo:http://internal/svc-a/info")
      assert(rows(2L) == "echo:http://internal/svc-b/info")
    } finally HttpFunctions.client = HttpFunctions.DefaultClient
  }

  test("scrape: selector and pattern extraction") {
    val df = Seq(
      (1L, "<html><title>Hello</title><body>x</body></html>"),
      (2L, "<html><title>World</title></html>")
    ).toDF("id", "html")
    val out = SelectCompiler(df, Json.parse(
      """[
        {"name": "id"},
        {"name": "title", "func": "scrape", "field": "html",
         "selector": "title"},
        {"name": "via_pattern", "func": "scrape", "field": "html",
         "pattern": "<title>(\\w+)</title>"}
      ]"""))
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(1L) == ("Hello", "Hello"))
    assert(rows(2L) == ("World", "World"))
  }

  test("reshape: chunk and flatten") {
    val df = Seq((1L, Seq(1, 2, 3, 4, 5, 6))).toDF("id", "arr")
    val out = SelectCompiler(df, Json.parse(
      """[
        {"name": "id"},
        {"name": "m", "func": "reshape", "field": "arr", "shape": [2, 3]}
      ]"""))
    val m = out.select("m").as[Seq[Seq[Int]]].head()
    assert(m == Seq(Seq(1, 2, 3), Seq(4, 5, 6)))
    val flat = SelectCompiler(out, Json.parse(
      """[
        {"name": "back", "func": "reshape", "field": "m", "shape": [-1]}
      ]"""))
    assert(flat.select("back").as[Seq[Int]].head() == Seq(1, 2, 3, 4, 5, 6))
  }

  test("reshape: 3-dim shape nests innermost-first; matrix schema " +
      "type carries shape metadata") {
    val df = Seq((1L, List.range(1, 13))).toDF("id", "arr")
    val out = SelectCompiler(df, Json.parse(
      """[
        {"name": "m", "func": "reshape", "field": "arr", "shape": [2, 2, 3]}
      ]"""))
    val m = out.select("m").as[Seq[Seq[Seq[Int]]]].head()
    assert(m == Seq(
      Seq(Seq(1, 2, 3), Seq(4, 5, 6)),
      Seq(Seq(7, 8, 9), Seq(10, 11, 12))))
    // schema type matrix → nested arrays + shape metadata
    val st = graft.schema.SchemaMapper.toStructType(Json.parse(
      """{"fields": [
        {"name": "emb", "type": "matrix", "shape": [4, 8],
         "valueType": {"type": "float32"}}]}"""))
    assert(st("emb").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(st("emb").metadata.getLongArray("shape").toSeq === Seq(4L, 8L))
  }

  test("scrape: CSS-subset selectors, attributes, repeated mode, pattern") {
    val html =
      """<html><body>
        |<div class="item" id="main"><span class="price">$ 12.50</span>
        |  <a href="/p/1">One</a></div>
        |<div class="item"><span class="price">$ 7</span>
        |  <a href="/p/2">Two</a></div>
        |<div class="other"><a href="/x">skip</a></div>
        |</body></html>""".stripMargin
    val df = spark.createDataFrame(Seq(Tuple1(html))).toDF("html")
    val sel = Json.parse("""[
      {"name": "html"},
      {"name": "first_price", "func": "scrape", "field": "html",
       "selector": "div.item span.price"},
      {"name": "main_price", "func": "scrape", "field": "html",
       "selector": "#main .price"},
      {"name": "links", "func": "scrape", "field": "html",
       "selector": "div.item a", "attribute": "href",
       "mode": "repeated"},
      {"name": "amount", "func": "scrape", "field": "html",
       "selector": "div.item span.price",
       "pattern": "([0-9.]+)", "group": 1}]""")
    val out = SelectCompiler(df, sel).collect()(0)
    assert(out.getAs[String]("first_price") == "$ 12.50")
    assert(out.getAs[String]("main_price") == "$ 12.50")
    assert(out.getSeq[String](out.fieldIndex("links")) ==
      Seq("/p/1", "/p/2"))
    assert(out.getAs[String]("amount") == "12.50")
  }

  test("scrape: nested fields produce array-of-struct per element") {
    val html =
      """<html><body>
        |<div class="item"><span class="price">$ 12.50</span>
        |  <a href="/p/1">One</a><a href="/p/2">Alt</a></div>
        |<div class="item"><span class="price">$ 7</span>
        |  <a href="/p/3">Two</a></div>
        |</body></html>""".stripMargin
    val df = spark.createDataFrame(Seq(Tuple1(html))).toDF("html")
    val sel = Json.parse("""[
      {"name": "items", "func": "scrape", "field": "html",
       "selector": "div.item", "mode": "repeated",
       "fields": [
         {"name": "price", "selector": "span.price",
          "pattern": "([0-9.]+)", "group": 1},
         {"name": "links", "selector": "a", "attribute": "href",
          "mode": "repeated"},
         {"name": "label", "selector": "a"}]}]""")
    val out = SelectCompiler(df, sel)
    val rows = out.selectExpr("inline(items)").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("price") == "12.50")
    assert(rows(0).getSeq[String](rows(0).fieldIndex("links")) ==
      Seq("/p/1", "/p/2"))
    assert(rows(0).getAs[String]("label") == "One")
    assert(rows(1).getAs[String]("price") == "7")
    assert(rows(1).getSeq[String](rows(1).fieldIndex("links")) ==
      Seq("/p/3"))
  }
  test("split: normalized ratios, determinism, salt decorrelation") {
    val df = (1L to 4000L).toDF("id")
    def run(spec: String) = SelectCompiler(df, Json.parse(spec))
      .as[(Long, String)].collect().toMap
    val a = run("""[
      {"name": "id"},
      {"name": "split", "func": "split", "fields": ["id"],
       "ratios": {"train": 0.8, "val": 0.1, "test": 0.1}}]""")
    // integer weights normalize to the same assignment
    val b = run("""[
      {"name": "id"},
      {"name": "split", "func": "split", "fields": ["id"],
       "ratios": {"train": 8, "val": 1, "test": 1}}]""")
    assert(a == b, "8/1/1 must normalize to 0.8/0.1/0.1")
    // proportions land near the declared ratios
    val counts = a.values.groupBy(identity).view.mapValues(_.size)
    assert(math.abs(counts("train") - 3200) < 200, counts.toMap)
    assert(math.abs(counts("val") - 400) < 100, counts.toMap)
    assert(math.abs(counts("test") - 400) < 100, counts.toMap)
    // salt decorrelates: a salted split reassigns ~20% of train rows
    val salted = run("""[
      {"name": "id"},
      {"name": "split", "func": "split", "fields": ["id"],
       "salt": "s2",
       "ratios": {"train": 0.8, "val": 0.1, "test": 0.1}}]""")
    val moved = a.count { case (id, l) => salted(id) != l }
    assert(moved > 400, s"salt barely moved $moved rows")
    val e = intercept[IllegalArgumentException](run("""[
      {"name": "split", "func": "split", "fields": ["id"],
       "ratios": {}}]"""))
    assert(e.getMessage.contains("ratios"))
  }
  test("quantize/dequantize: int8 roundtrip bound and zero-vector") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "embedding")
    val out = SelectCompiler(df, Json.parse(
      """[
        {"name": "id"},
        {"name": "qv", "field": "embedding", "func": "quantize"},
        {"name": "dq", "field": "qv", "func": "dequantize"},
        {"name": "embedding"}
      ]"""))
    val r1 = out.filter(col("id") === 1).head()
    val qv = r1.getStruct(1)
    val scale = qv.getDouble(0)
    assert(math.abs(scale - 1.0 / 127.0) < 1e-12)
    assert(qv.getSeq[Byte](1) == Seq[Byte](64, -127, 32, 0))
    val dq = r1.getSeq[Float](2)
    val orig = r1.getSeq[Float](3)
    dq.zip(orig).foreach { case (a, b) =>
      assert(math.abs(a - b) <= scale / 2 + 1e-9) }
    // all-zero vector: scale 0, q all zero, dequantize all zero
    val r2 = out.filter(col("id") === 2).head()
    assert(r2.getStruct(1).getDouble(0) == 0.0)
    assert(r2.getStruct(1).getSeq[Byte](1).forall(_ == 0))
    assert(r2.getSeq[Float](2).forall(_ == 0.0f))
  }

  test("url func decomposes parts; missing pieces null; bad part " +
      "fails actionably") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "https://u:p@a.example.com:8443/x/y?q=1&z=2#frag"),
      (2L, "http://plain.org"),
      (3L, null: String)).toDF("id", "url")
    val out = SelectCompiler(df, Json.parse(
      """[
        {"name": "id"},
        {"name": "h", "field": "url", "func": "url", "part": "host"},
        {"name": "p", "field": "url", "func": "url", "part": "path"},
        {"name": "q", "field": "url", "func": "url", "part": "query",
         "key": "q"}
      ]"""))
    val m = out.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(m(1L) == (("a.example.com", "/x/y", "1")))
    assert(m(2L) == (("plain.org", "", null)))
    assert(m(3L) == ((null, null, null)))
    val e = intercept[IllegalArgumentException](SelectCompiler(df,
      Json.parse(
        """[{"name": "h", "field": "url", "func": "url",
            "part": "tld"}]""")))
    assert(e.getMessage.contains("valid"))
    val e2 = intercept[IllegalArgumentException](SelectCompiler(df,
      Json.parse(
        """[{"name": "h", "field": "url", "func": "url",
            "part": "host", "key": "q"}]""")))
    assert(e2.getMessage.contains("query"))
  }

  /** Property pin of the documented reconstruction contract
    * (SelectCompiler.quantizeCol): for ANY vector,
    * max |v − dequantize(quantize(v))| ≤ scale/2 — round() misses a
    * true value by at most half a quantization step, and the float32
    * output cast adds at most 2⁻²⁴ relative error on top. */
  test("quantize roundtrip error bound holds over random vectors") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    def vec(): Array[Float] = {
      // mix magnitudes so scale varies over 6 orders
      val mag = math.pow(10.0, rnd.nextInt(6) - 3).toFloat
      Array.fill(16)((rnd.nextFloat() * 2 - 1) * mag)
    }
    val df = (1L to 200L).map(i => (i, vec())).toDF("id", "embedding")
    val out = SelectCompiler(df, Json.parse(
      """[
        {"name": "id"},
        {"name": "qv", "field": "embedding", "func": "quantize"},
        {"name": "dq", "field": "qv", "func": "dequantize"},
        {"name": "embedding"}
      ]"""))
    val bad = out.select(
      aggregate(
        zip_with(col("dq"), col("embedding"),
          (a, b) => abs(a.cast("double") - b.cast("double"))),
        lit(0.0), (acc, x) => greatest(acc, x))
        .as("err"),
      col("qv.scale").as("scale"))
      .filter(col("err") > col("scale") / 2 * 1.0001 + lit(1e-12))
      .count()
    assert(bad == 0, s"$bad vectors exceeded the scale/2 bound")
  }
}
