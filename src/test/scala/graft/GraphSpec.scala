package graft

import org.scalatest.funsuite.AnyFunSuite

/** graph transform — oracled end-to-end by q103 (closed-form chain
  * components over integer keys); these pin string vertices, merged
  * chains, and the guards. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(params: String, df: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("graph")(spark,
      Pipeline.ModuleCfg("g", "graph", Seq("e"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("e" -> df))("g")

  test("connected components over string vertices, chains merged " +
      "across buckets") {
    // a-b, b-c form one component even though a and c never share an
    // edge; x-y is separate; d-d is a self-loop singleton
    val edges = Seq(("b", "a"), ("b", "c"), ("x", "y"), ("d", "d"))
      .toDF("src", "dst")
    val out = cc("""{"method": "connectedComponents"}""", edges)
      .as[(String, String)].collect().toMap
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "d" -> "d"))
  }

  test("degrees: distinct-neighbor counts — duplicate and reversed " +
      "edges collapse, self-loops count once, nulls drop") {
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "b"), // one undirected edge
      ("a", "c"),
      ("d", "d"), // self-loop: d's one neighbor is itself
      ("e", null), (null, "e")) // null-partnered edges drop entirely
      .toDF("src", "dst")
    val out = cc("""{"method": "degrees"}""", edges)
    assert(out.columns.toSeq == Seq("vertex", "degree"))
    val m = out.as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 2L, "b" -> 1L, "c" -> 1L, "d" -> 1L))
    val e = intercept[IllegalArgumentException](
      cc("""{"method": "pagerank"}""", edges))
    assert(e.getMessage.contains("valid"))
  }

  test("custom field names and null edges dropped") {
    val edges = Seq((Some(1L), Some(2L)), (None, Some(3L)),
      (Some(3L), None)).toDF("l", "r")
    val out = cc(
      """{"srcField": "l", "dstField": "r",
         "vertexField": "v", "componentField": "c"}""", edges)
    assert(out.columns.toSeq == Seq("v", "c"))
    val m = out.as[(Long, Long)].collect().toMap
    // 3 appears only on null-partnered edges: it stays its own
    // component; the 1-2 edge resolves to min 1
    assert(m == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("unknown method fails actionably") {
    val e = intercept[IllegalArgumentException](cc(
      """{"method": "pagerank"}""",
      Seq((1, 2)).toDF("src", "dst")))
    assert(e.getMessage.contains("connectedComponents"))
  }
}
