package graft

import org.scalatest.funsuite.AnyFunSuite

/** pivot/unpivot — oracled end-to-end by q84/q85; these pin the
  * implicit-values pivot and the all-non-id-columns unpivot. */
class PivotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(("a", "x", 1.0), ("a", "y", 2.0),
    ("b", "x", 4.0)).toDF("g", "s", "v")

  test("pivot without declared values discovers them (distinct scan)") {
    val out = Pipeline.transforms("pivot")(spark,
      Pipeline.ModuleCfg("pv", "pivot", Seq("in"), Nil,
        graft.config.Json.parse("""{
          "groupFields": ["g"], "pivotField": "s",
          "aggregations": [{"name": "t", "op": "sum", "field": "v"}]}"""),
        graft.config.Json.obj()), Map("in" -> rows))("pv")
    assert(out.columns.toSeq == Seq("g", "x", "y"))
    val m = out.collect().map(r => r.getString(0) ->
      (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(m("a") == (Some(1.0), Some(2.0)))
    assert(m("b") == (Some(4.0), None))
  }

  test("discovered values hit the pivotMaxValues cap with Spark's " +
      "actionable error") {
    val many = (1 to 50).map(i => ("g", s"s$i", 1.0)).toDF("g", "s", "v")
    val prev = spark.conf.get("spark.sql.pivotMaxValues")
    spark.conf.set("spark.sql.pivotMaxValues", "10")
    try {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        Pipeline.transforms("pivot")(spark,
          Pipeline.ModuleCfg("pv", "pivot", Seq("in"), Nil,
            graft.config.Json.parse("""{
              "groupFields": ["g"], "pivotField": "s",
              "aggregations": [
                {"name": "t", "op": "sum", "field": "v"}]}"""),
            graft.config.Json.obj()), Map("in" -> many))("pv")
          .collect()
      }
      assert(e.getMessage.contains("pivotMaxValues") ||
        e.getMessage.contains("10"), e.getMessage)
    } finally spark.conf.set("spark.sql.pivotMaxValues", prev)
  }

  test("unpivot with no valueFields melts every non-id column") {
    val wide = Seq((1L, 2.0, 3.0)).toDF("id", "p", "q")
    val out = Pipeline.transforms("unpivot")(spark,
      Pipeline.ModuleCfg("up", "unpivot", Seq("in"), Nil,
        graft.config.Json.parse("""{"idFields": ["id"]}"""),
        graft.config.Json.obj()), Map("in" -> wide))("up")
    assert(out.columns.toSeq == Seq("id", "variable", "value"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1),
      r.getDouble(2))).toSet == Set((1L, "p", 2.0), (1L, "q", 3.0)))
  }
}
