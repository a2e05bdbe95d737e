package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Pins the r21 optimization-round internals:
  *  - `pinIfComputed` persists computed frames and leaves bare scans
  *    alone (the persist-if-multiply-referenced heuristic behind the
  *    sql module's self-join pin and the graph edge-input pin);
  *  - the sql module actually pins a multiply-referenced computed
  *    input (q126/q132's `FROM knn a JOIN knn b` shape);
  *  - the aggregation module widens narrow inputs ONLY for the
  *    heavy-op list (count_distinct/median/exact percentile) — cheap
  *    sums must not pay the exchange, and sketch ops must not widen
  *    (ApproxTopKCombine crashes on empty partitions).
  */
class Round21OptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pinIfComputed persists computed frames, passes scans through") {
    val base = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "s")
    // a projection/filter-only frame stays unpinned
    val thin = base.select("id").filter(col("id") > 0)
    assert(operators.TransformCommon.pinIfComputed(thin)
      .storageLevel == StorageLevel.NONE,
      "plain projections must not be pinned")
    // an aggregated frame pins
    val agged = base.groupBy("s").agg(count(lit(1)).as("n"))
    val pinned = operators.TransformCommon.pinIfComputed(agged)
    try assert(pinned.storageLevel != StorageLevel.NONE,
      "aggregates referenced multiple times must pin")
    finally pinned.unpersist()
    // an already-pinned frame is not re-pinned (withCachedData sees
    // the InMemoryRelation)
    val again = operators.TransformCommon.pinIfComputed(agged)
    try {
      val over = operators.TransformCommon
        .pinIfComputed(again.select(col("s")))
      assert(over.storageLevel == StorageLevel.NONE,
        "a thin projection over a cached aggregate must not re-pin")
    } finally again.unpersist()
  }

  test("sql module pins a computed input it references twice") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 2L)).toDF("a", "b")
      .groupBy("a", "b").agg(count(lit(1)).as("n")) // computed
    val out = Pipeline.transforms("sql")(spark,
      Pipeline.ModuleCfg("m", "sql", Seq("t"), Nil,
        graft.config.Json.parse(
          """{"sql": "SELECT x.a, y.b FROM t x JOIN t y ON x.b = y.a"}"""),
        graft.config.Json.obj()),
      Map("t" -> edges))("m")
    // the registered view's underlying frame is cached — the plan
    // contains InMemoryRelation instead of two aggregate subtrees
    val p = out.queryExecution.optimizedPlan.toString
    assert(p.contains("InMemoryRelation"),
      "a twice-referenced computed input must pin:\n" + p)
    assert(out.count() == 1)
    edges.unpersist()
  }

  test("aggregation widens for heavy ops only") {
    def agg(ops: String) = Pipeline.transforms("aggregation")(spark,
      Pipeline.ModuleCfg("m", "aggregation", Seq("t"), Nil,
        graft.config.Json.parse(
          s"""{"groupFields": ["g"], "aggregations":
              [{"input": "t", "fields": [$ops]}]}"""),
        graft.config.Json.obj()),
      Map("t" -> Seq(("x", 1.0), ("x", 2.0), ("y", 3.0))
        .toDF("g", "v")))("m")
    val heavy = agg("""{"name": "p", "op": "percentile",
        "field": "v", "percentile": 0.5}""")
      .queryExecution.executedPlan.toString
    assert(heavy.toLowerCase.contains("roundrobinpartitioning"),
      "exact percentile over a narrow input must widen:\n" + heavy)
    val cheap = agg("""{"name": "s", "op": "sum", "field": "v"}""")
      .queryExecution.executedPlan.toString
    assert(!cheap.toLowerCase.contains("roundrobinpartitioning"),
      "plain sums must not pay the widen exchange:\n" + cheap)
    val sketch = agg("""{"name": "k", "op": "top_k", "field": "v"}""")
      .queryExecution.executedPlan.toString
    assert(!sketch.toLowerCase.contains("roundrobinpartitioning"),
      "sketch ops must not widen (empty-partition combine crash):\n" +
        sketch)
  }

  test("count_distinct + exact percentile split into joined aggregates") {
    def agg(ops: String) = Pipeline.transforms("aggregation")(spark,
      Pipeline.ModuleCfg("m", "aggregation", Seq("t"), Nil,
        graft.config.Json.parse(
          s"""{"groupFields": ["g"], "aggregations":
              [{"input": "t", "fields": [$ops]}]}"""),
        graft.config.Json.obj()),
      Map("t" -> Seq(("x", 1.0, "a"), ("x", 2.0, "b"), ("x", 2.0, "b"),
        ("y", 3.0, "c"), (null, 5.0, "c"))
        .toDF("g", "v", "k")))("m")
    val both = agg(
      """{"name": "d", "op": "count_distinct", "field": "k"},
         {"name": "p", "op": "percentile", "field": "v",
          "percentile": 0.5},
         {"name": "n", "op": "count"}""")
    // the split shape: percentile's object aggregate is keyed by the
    // GROUP only (no Expand above it), the distinct Expand lives in
    // its own joined subtree
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("Join"),
      "mixed distinct+percentile must split into joined aggregates:\n"
        + plan)
    // values identical to the single-pass semantics, null group kept
    val rows = both.orderBy(asc_nulls_first("g"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getLong(3)))
    assert(rows.toSeq == Seq((null, 1L, 5.0, 1L),
      ("x", 2L, 2.0, 3L), ("y", 1L, 3.0, 1L)), rows.toSeq.toString)
    // single-class specs keep the one-pass plan (no join)
    val solo = agg("""{"name": "p", "op": "percentile",
        "field": "v", "percentile": 0.5}""")
      .queryExecution.executedPlan.toString
    assert(!solo.contains("Join"),
      "percentile-only specs must stay single-pass:\n" + solo)
  }
}
