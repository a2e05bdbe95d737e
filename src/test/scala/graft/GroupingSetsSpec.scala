package graft

import org.scalatest.funsuite.AnyFunSuite

/** rollup/cube/groupingSets on the aggregation module — rollup is
  * oracled end-to-end by q81; these pin cube, explicit sets, the
  * bitmask, and the two composition guards. */
class GroupingSetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(("a", "x", 1.0), ("a", "y", 2.0),
    ("b", "x", 4.0)).toDF("g1", "g2", "v")

  private def agg(extra: String) =
    Pipeline.transforms("aggregation")(spark,
      Pipeline.ModuleCfg("agg", "aggregation", Seq("in"), Nil,
        graft.config.Json.parse(s"""{
          "groupFields": ["g1", "g2"], $extra
          "aggregations": [{"input": "in", "fields": [
            {"name": "total", "op": "sum", "field": "v"}]}]}"""),
        graft.config.Json.obj()), Map("in" -> rows))("agg")

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (Option(r.getAs[String]("g1")).getOrElse("·"),
      Option(r.getAs[String]("g2")).getOrElse("·"),
      r.getAs[Long]("__grouping_id")) ->
      r.getAs[Double]("total")).toMap

  test("cube emits every subset level with the grouping_id bitmask") {
    val m = keyed(agg(""""groupType": "cube","""))
    assert(m.size == 8) // 3 pairs + 2 g1 levels + 2 g2 levels + grand
    assert(m(("a", "x", 0L)) == 1.0)
    assert(m(("a", "·", 1L)) == 3.0) // g2 aggregated -> low bit set
    assert(m(("·", "x", 2L)) == 5.0) // g1 aggregated -> high bit set
    assert(m(("·", "·", 3L)) == 7.0)
  }

  test("explicit groupingSets evaluates only the listed subsets") {
    val m = keyed(agg(""""groupingSets": [["g1"], []],"""))
    assert(m.keySet.map(_._3) == Set(1L, 3L))
    assert(m(("a", "·", 1L)) == 3.0 && m(("b", "·", 1L)) == 4.0)
    assert(m(("·", "·", 3L)) == 7.0)
  }

  test("groupingSets fields must come from groupFields; window " +
      "strategies are rejected") {
    val e1 = intercept[IllegalArgumentException](
      agg(""""groupingSets": [["nope"]],""").collect())
    assert(e1.getMessage.contains("not in groupFields"))
    val e2 = intercept[IllegalArgumentException](Pipeline.transforms(
      "aggregation")(spark,
      Pipeline.ModuleCfg("agg", "aggregation", Seq("in"), Nil,
        graft.config.Json.parse("""{
          "groupFields": ["g1"], "groupType": "rollup",
          "strategy": {"timestampField": "v",
            "window": {"type": "fixed", "size": "1h"}},
          "aggregations": [{"input": "in", "fields": [
            {"name": "n", "op": "count"}]}]}"""),
        graft.config.Json.obj()),
      Map("in" -> rows.withColumn("v",
        org.apache.spark.sql.functions.current_timestamp()))))
    assert(e2.getMessage.contains("window"))
  }
}
