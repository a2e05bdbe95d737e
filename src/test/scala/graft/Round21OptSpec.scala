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

  test("pinIfComputed pins multi-pass shapes, cost-guards the rest") {
    val base = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "s")
    // a projection/filter-only frame stays unpinned
    val thin = base.select("id").filter(col("id") > 0)
    assert(operators.TransformCommon.pinIfComputed(thin)
      .storageLevel == StorageLevel.NONE,
      "plain projections must not be pinned")
    // a TINY aggregate recomputes (r22 cost guard: below the
    // broadcast threshold the InMemoryRelation build costs more than
    // the recompute AQE stage reuse dedupes — the q104 regression)
    val agged = base.groupBy("s").agg(count(lit(1)).as("n"))
    assert(operators.TransformCommon.pinIfComputed(agged)
      .storageLevel == StorageLevel.NONE,
      "sub-threshold aggregates must not pin")
    // the same aggregate past the (lowered) threshold pins
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "1")
    try {
      val pinned = operators.TransformCommon.pinIfComputed(agged)
      try assert(pinned.storageLevel != StorageLevel.NONE,
        "past-threshold aggregates must pin")
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
    } finally spark.conf.set(key, prior)
    // a JOIN-shaped frame pins regardless of size: its re-execution
    // is a full multi-pass upstream rebuild per reference (q126/q132)
    val other = Seq((1L, 9L)).toDF("id", "x")
    val joined = base.join(other, Seq("id"))
    val jp = operators.TransformCommon.pinIfComputed(joined)
    try assert(jp.storageLevel != StorageLevel.NONE,
      "join-shaped frames must pin")
    finally jp.unpersist()
  }

  test("sql module pins a computed multi-pass input it references twice") {
    val left = Seq((1L, 2L), (2L, 3L), (1L, 2L)).toDF("a", "b")
    val right = Seq((2L, 1.0), (3L, 2.0)).toDF("b", "w")
    val edges = left.join(right, Seq("b")) // multi-pass: always pins
    val out = Pipeline.transforms("sql")(spark,
      Pipeline.ModuleCfg("m", "sql", Seq("t"), Nil,
        graft.config.Json.parse(
          """{"sql": "SELECT x.a, y.b FROM t x JOIN t y ON x.b = y.a"}"""),
        graft.config.Json.obj()),
      Map("t" -> edges))("m")
    // the registered view's underlying frame is cached — the plan
    // contains InMemoryRelation instead of two join subtrees
    val p = out.queryExecution.optimizedPlan.toString
    assert(p.contains("InMemoryRelation"),
      "a twice-referenced computed input must pin:\n" + p)
    assert(out.count() == 2)
    edges.unpersist()
  }

  test("sql module leaves a tiny twice-referenced aggregate unpinned") {
    // the q104 shape: a ~few-group aggregate referenced repeatedly in
    // the statement — the r22 cost guard lets AQE's in-action stage
    // reuse cover it instead of paying an InMemoryRelation build
    val agged = Seq((1L, "a"), (2L, "b"), (2L, "b")).toDF("id", "s")
      .groupBy("s").agg(count(lit(1)).as("n"))
    val out = Pipeline.transforms("sql")(spark,
      Pipeline.ModuleCfg("m", "sql", Seq("t"), Nil,
        graft.config.Json.parse(
          """{"sql": "SELECT x.s, x.n, y.n AS n2 FROM t x JOIN t y ON x.s = y.s"}"""),
        graft.config.Json.obj()),
      Map("t" -> agged))("m")
    val p = out.queryExecution.optimizedPlan.toString
    assert(!p.contains("InMemoryRelation"),
      "a sub-threshold aggregate must not pin:\n" + p)
    assert(out.count() == 2)
  }

  test("sql reference count ignores literals and comments") {
    // the view name inside a string literal and a line comment must
    // not count as a reference (r22 advice) — a single real reference
    // plus two fake ones stays unpinned even for a join-shaped input
    val joined = Seq((1L, 2L)).toDF("a", "b")
      .join(Seq((2L, 1.0)).toDF("b", "w"), Seq("b"))
    val out = Pipeline.transforms("sql")(spark,
      Pipeline.ModuleCfg("m", "sql", Seq("t"), Nil,
        graft.config.Json.parse(
          """{"sql": "SELECT a, 't' AS lit -- t t t\nFROM t"}"""),
        graft.config.Json.obj()),
      Map("t" -> joined))("m")
    val p = out.queryExecution.optimizedPlan.toString
    assert(!p.contains("InMemoryRelation"),
      "literal/comment mentions must not inflate the count:\n" + p)
    assert(out.count() == 1)
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
