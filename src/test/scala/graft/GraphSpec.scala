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
  }

  test("triangles: K4 has 3 per vertex; dups/self-loops/isolates " +
      "behave") {
    // K4 on a..d (each vertex in C(3,2)=3 triangles) + a dangling
    // chain edge d-e (e closes nothing) + noise: a duplicate, a
    // reversed duplicate, and a self-loop
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"),
      ("b", "a"), ("a", "b"), ("c", "c"),
      ("d", "e")).toDF("src", "dst")
    val out = cc("""{"method": "triangles"}""", edges)
    assert(out.columns.toSeq == Seq("vertex", "triangles"))
    val m = out.as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L,
      "e" -> 0L))
  }

  test("clusteringCoefficient: cliques score 1, chain ends 0, " +
      "self-loops never count as neighbors") {
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), // K4: every vertex c = 2*3/(3*2) = 1.0
      ("c", "c"), // self-loop must not inflate c's degree
      ("d", "e")).toDF("src", "dst")
    val out = cc("""{"method": "clusteringCoefficient"}""", edges)
    assert(out.columns.toSeq ==
      Seq("vertex", "triangles", "degree", "coefficient"))
    val m = out.select("vertex", "degree", "coefficient")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("a") == ((3L, 1.0)) && m("b") == ((3L, 1.0)) &&
      m("c") == ((3L, 1.0)))
    assert(m("d") == ((4L, 0.5))) // 3 triangles of C(4,2)=6 pairs
    assert(m("e") == ((1L, 0.0))) // degree 1 -> defined as 0
  }

  test("triangles: star graph (max skew) counts zero everywhere") {
    // the degree-ordered orientation points every edge AT the hub,
    // so the hub fans out no wedges — the skew case the orientation
    // exists for
    val edges = (1 to 50).map(i => ("hub", s"leaf$i"))
      .toDF("src", "dst")
    val out = cc("""{"method": "triangles"}""", edges)
      .as[(String, Long)].collect().toMap
    assert(out.size == 51 && out.values.forall(_ == 0L))
  }

  test("pagerank: cycle is uniform, star concentrates rank in the " +
      "hub, danglings keep the teleport floor") {
    // 4-cycle: every vertex has in/out degree 1 — rank stays uniform
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val uni = cc("""{"method": "pagerank"}""", cyc)
      .as[(Long, Double)].collect().toMap
    assert(uni.size == 4)
    // symmetric ops → identical bits per vertex, and ≈ 1/N
    assert(uni.values.toSet.size == 1, uni)
    assert(math.abs(uni(1L) - 0.25) < 1e-9)
    // star: leaves 2..5 all point at hub 1 (a dangling vertex):
    // hub rank = base + d·4·(base) after convergence > leaf rank
    val star = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("src", "dst")
    val r = cc(
      """{"method": "pagerank", "damping": 0.85,
         "maxIterations": 10, "rankField": "pr"}""", star)
    assert(r.columns.toSeq == Seq("vertex", "pr"))
    val m = r.as[(Long, Double)].collect().toMap
    val base = 0.15 / 5
    assert(m(2L) == m(5L) && math.abs(m(2L) - base) < 1e-12,
      "leaves get no in-flow: rank must settle at the teleport floor")
    assert(m(1L) > 4 * m(2L), s"hub must dominate: $m")
    val e = intercept[IllegalArgumentException](cc(
      """{"method": "pagerank", "damping": 1.5}""", star))
    assert(e.getMessage.contains("damping"))
  }

  test("pagerank handleDangling redistributes parked mass: ranks " +
      "sum to 1 and dominance ordering is preserved") {
    // star: hub 1 is dangling; without redistribution total mass
    // decays below 1, with it the per-round hub mass flows back
    val star = Seq((2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("src", "dst")
    val m = cc(
      """{"method": "pagerank", "damping": 0.85,
         "maxIterations": 20, "handleDangling": true}""", star)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(m.values.sum - 1.0) < 1e-9,
      s"mass must be conserved: ${m.values.sum}")
    assert(m(1L) > m(2L) && m(2L) == m(5L), m)
    // the simple variant on the same graph loses mass
    val simple = cc(
      """{"method": "pagerank", "damping": 0.85,
         "maxIterations": 20}""", star)
      .as[(Long, Double)].collect().toMap
    assert(simple.values.sum < 0.9, s"simple variant keeps leaking: " +
      s"${simple.values.sum}")
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
      """{"method": "labelPropagation"}""",
      Seq((1, 2)).toDF("src", "dst")))
    assert(e.getMessage.contains("connectedComponents"))
  }
}
