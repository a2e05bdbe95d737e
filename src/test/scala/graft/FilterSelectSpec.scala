package graft

import graft.config.Json
import graft.expr.FilterCompiler
import graft.ops.SelectCompiler
import org.scalatest.funsuite.AnyFunSuite

class FilterSelectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alice", Some(10.0), "2024-01-01"),
    (2L, "bob", Some(20.0), "2024-02-01"),
    (3L, "carol", None, "2024-03-01"),
    (4L, "dave", Some(Double.NaN), "2024-04-01")
  ).toDF("id", "name", "score", "day")

  private def keep(filterJson: String): Set[Long] = {
    val cond = FilterCompiler.compile(Json.parse(filterJson), df.schema)
    df.filter(cond).select("id").as[Long].collect().toSet
  }

  test("leaf ops") {
    assert(keep("""[{"key":"id","op":">","value":2}]""") == Set(3L, 4L))
    assert(keep("""[{"key":"name","op":"=","value":"bob"}]""") == Set(2L))
    assert(keep("""[{"key":"name","op":"in","value":["alice","dave"]}]""")
      == Set(1L, 4L))
    assert(keep("""[{"key":"name","op":"not in","value":["alice"]}]""")
      == Set(2L, 3L, 4L))
    assert(keep("""[{"key":"name","op":"match","value":"^a"}]""") == Set(1L))
    // match is find(), not full-match
    assert(keep("""[{"key":"name","op":"match","value":"o"}]""")
      == Set(2L, 3L))
  }

  test("null never satisfies ops; NaN compares false for every op") {
    assert(keep("""[{"key":"score","op":">","value":5}]""") == Set(1L, 2L))
    assert(keep("""[{"key":"score","op":"<","value":100}]""") == Set(1L, 2L))
    assert(keep("""[{"key":"score","op":"!=","value":10}]""") == Set(2L))
    // null literal: = matches only null field; != only non-null
    assert(keep("""[{"key":"score","op":"=","value":null}]""") == Set(3L))
    assert(keep("""[{"key":"score","op":"!=","value":null}]""")
      == Set(1L, 2L, 4L))
  }

  test("and/or nesting; array = implicit AND") {
    assert(keep(
      """[{"key":"id","op":">","value":1},{"key":"id","op":"<","value":4}]""")
      == Set(2L, 3L))
    assert(keep(
      """{"or":[{"key":"id","op":"=","value":1},{"key":"name","op":"=","value":"bob"}]}""")
      == Set(1L, 2L))
    assert(keep(
      """{"and":[{"key":"id","op":">","value":0},{"or":[{"key":"name","op":"=","value":"alice"},{"key":"name","op":"=","value":"dave"}]}]}""")
      == Set(1L, 4L))
  }

  test("expression leaf") {
    assert(keep(
      """[{"expression":"id * 10","op":">=","value":30}]""") == Set(3L, 4L))
  }

  test("select: pass/rename/cast/constant/expression/concat") {
    val sel = Json.parse(
      """[
        {"name":"id"},
        {"name":"who","field":"name"},
        {"name":"id_str","field":"id","type":"string"},
        {"name":"src","value":"graft","type":"string"},
        {"name":"double_id","expression":"id * 2"},
        {"name":"label","func":"concat","fields":["name","id_str"],"delimiter":"-"}
      ]""")
    val out = SelectCompiler(df, sel)
    assert(out.columns.toSeq ==
      Seq("id", "who", "id_str", "src", "double_id", "label"))
    val r = out.filter($"id" === 1).collect()(0)
    assert(r.getAs[String]("who") == "alice")
    assert(r.getAs[String]("id_str") == "1")
    assert(r.getAs[String]("src") == "graft")
    assert(r.getAs[Double]("double_id") == 2.0)
    assert(r.getAs[String]("label") == "alice-1")
  }

  test("select steps see prior outputs; hash/uuid/nullif/json") {
    val sel = Json.parse(
      """[
        {"name":"base","expression":"id + 1"},
        {"name":"twice","expression":"base * 2"},
        {"name":"h","func":"hash","field":"name","algorithm":"MD5"},
        {"name":"u","func":"uuid"},
        {"name":"maybe","func":"nullif","field":"name",
         "condition":[{"key":"id","op":"=","value":2}]},
        {"name":"j","func":"json","fields":["id","name"]}
      ]""")
    val out = SelectCompiler(df, sel).collect()
    val r1 = out.find(_.getAs[Double]("base") == 2.0).get
    assert(r1.getAs[Double]("twice") == 4.0)
    assert(r1.getAs[String]("h") ==
      "6384e2b2184bcbf58eccf10ca7a6563c") // md5("alice")
    assert(r1.getAs[String]("u").length == 36)
    assert(r1.getAs[String]("maybe") == "alice")
    assert(r1.getAs[String]("j") == """{"id":1,"name":"alice"}""")
    val r2 = out.find(_.getAs[Double]("base") == 3.0).get
    assert(r2.getAs[String]("maybe") == null)
  }

  test("select: switch and template text") {
    val sel = Json.parse(
      """[
        {"name":"tier","func":"switch","cases":[
          {"when":[{"key":"id","op":"<=","value":1}],"value":"low"},
          {"when":[{"key":"id","op":"<=","value":3}],"value":"mid"}],
         "default":"high"},
        {"name":"msg","func":"text","text":"user ${name} is #${id}"}
      ]""")
    val out = SelectCompiler(df, sel).collect()
    assert(out.map(_.getAs[String]("tier")).toSet == Set("low", "mid", "high"))
    assert(out.map(_.getAs[String]("msg")).contains("user alice is #1"))
  }

  test("select §2.11: bad cast routes to .failures instead of failing") {
    val rows = Seq((1L, "10"), (2L, "oops"), (3L, "30"))
      .toDF("id", "raw")
    val dfs = Pipeline.transforms("select")(spark,
      Pipeline.ModuleCfg("s", "select", Seq("in"), Nil,
        Json.parse("""{"select": [
          {"name": "id"},
          {"name": "v", "field": "raw", "type": "int64"}]}"""),
        Json.parse("""{"outputFailure": true}""")),
      Map("in" -> rows))
    val main = dfs("s").orderBy("id").collect()
    assert(main.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L))
    assert(main.map(_.getAs[Long]("v")).toSeq == Seq(10L, 30L))
    val fails = dfs("s.failures").collect()
    assert(fails.length == 1)
    assert(fails.head.getAs[Long]("id") == 2L)
    assert(fails.head.getAs[String]("raw") == "oops") // input preserved
    assert(fails.head.getAs[String]("__error").contains("cast to int64"))
  }

  test("select §2.11: IN-PLACE cast (name == field) still routes failures") {
    val rows = Seq((1L, "10"), (2L, "oops")).toDF("id", "raw")
    val dfs = Pipeline.transforms("select")(spark,
      Pipeline.ModuleCfg("s", "select", Seq("in"), Nil,
        Json.parse("""{"select": [
          {"name": "id"},
          {"name": "raw", "type": "int64"}]}"""),
        Json.parse("""{"outputFailure": true}""")),
      Map("in" -> rows))
    val main = dfs("s").collect()
    assert(main.length == 1 && main.head.getAs[Long]("raw") == 10L)
    val fails = dfs("s.failures").collect()
    assert(fails.length == 1)
    assert(fails.head.getAs[String]("raw") == "oops") // ORIGINAL value
    assert(fails.head.getAs[String]("__error").contains("cast to int64"))
  }

  test("select §2.11: failFast raises on lossy cast; default stays lenient") {
    val rows = Seq((1L, "10"), (2L, "oops")).toDF("id", "raw")
    val cfgSel = Json.parse("""{"select": [
      {"name": "id"},
      {"name": "v", "field": "raw", "type": "int64"}]}""")
    val strict = Pipeline.transforms("select")(spark,
      Pipeline.ModuleCfg("s", "select", Seq("in"), Nil, cfgSel,
        Json.parse("""{"failFast": true}""")), Map("in" -> rows))
    val e = intercept[Exception] { strict("s").collect() }
    assert(e.getMessage != null)
    // default: legacy lenient null-out, no failures collection
    val lenient = Pipeline.transforms("select")(spark,
      Pipeline.ModuleCfg("s", "select", Seq("in"), Nil, cfgSel,
        Json.obj()), Map("in" -> rows))
    assert(!lenient.contains("s.failures"))
    val out = lenient("s").orderBy("id").collect()
    assert(out.length == 2 && out(1).isNullAt(out(1).fieldIndex("v")))
  }
}
