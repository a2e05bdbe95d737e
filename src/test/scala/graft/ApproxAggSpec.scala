package graft

import org.scalatest.funsuite.AnyFunSuite

/** Approx/distinct aggregation ops — the exact forms are oracled by
  * q80; these pin the sketch twins (whose values are sketch-dependent
  * and cannot hash-match SQL) and the exact/approx relationships. */
class ApproxAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def agg(fields: String, df: org.apache.spark.sql.DataFrame,
      groups: String = """["g"]""") =
    Pipeline.transforms("aggregation")(spark,
      Pipeline.ModuleCfg("agg", "aggregation", Seq("in"), Nil,
        graft.config.Json.parse(s"""{
          "groupFields": $groups,
          "aggregations": [{"input": "in", "fields": [$fields]}]}"""),
        graft.config.Json.obj()), Map("in" -> df))("agg")

  private lazy val big = (1 to 20000)
    .map(i => ("g", i % 3000, i.toDouble)).toDF("g", "k", "v")

  test("approx_count_distinct lands within 3·rsd of the exact count") {
    val out = agg(
      """{"name": "ad", "op": "approx_count_distinct", "field": "k",
         "rsd": 0.05},
         {"name": "ed", "op": "count_distinct", "field": "k"}""", big)
      .collect().head
    val exact = out.getAs[Long]("ed")
    assert(exact == 3000L)
    val approx = out.getAs[Long]("ad")
    assert(math.abs(approx - exact) <= exact * 0.15,
      s"HLL estimate $approx too far from $exact")
  }

  test("median equals percentile 0.5; approximate percentile at high " +
      "accuracy matches the exact value on small data") {
    val out = agg(
      """{"name": "med", "op": "median", "field": "v"},
         {"name": "p50", "op": "percentile", "field": "v",
          "percentile": 0.5},
         {"name": "p50a", "op": "percentile", "field": "v",
          "percentile": 0.5, "approximate": true, "accuracy": 100000}""",
      big).collect().head
    assert(out.getAs[Double]("med") == out.getAs[Double]("p50"))
    // percentile_approx returns a real data point; exact interpolates
    assert(math.abs(out.getAs[Double]("p50a") -
      out.getAs[Double]("p50")) <= 1.0)
  }

  test("hll sketch-merge estimate equals a single-pass sketch and " +
      "tracks the exact count at high cardinality") {
    import org.apache.spark.sql.functions._
    // two-stage: per-subkey sketches unioned up
    val pre = agg(
      """{"name": "sk", "op": "hll_sketch", "field": "k"}""",
      big, groups = """["g", "k"]""")
      // k in the group key makes per-group sketches; re-group by g
      .withColumnRenamed("g", "g0")
    val merged = agg(
      """{"name": "u", "op": "hll_union", "field": "sk"}""",
      pre.withColumnRenamed("g0", "g"), groups = """["g"]""")
    val est2 = merged.select(hll_sketch_estimate(col("u"))).head.getLong(0)
    // single pass over the raw rows
    val est1 = agg("""{"name": "sk", "op": "hll_sketch", "field": "k"}""",
      big).select(hll_sketch_estimate(col("sk"))).head.getLong(0)
    // DataSketches unions run an HLL_8 gadget whose estimator can
    // differ slightly from a single-pass sketch — the guarantee is
    // the same error bound, not bit-identical estimates (q87 pins
    // EXACT equality in the coupon-mode regime instead)
    for ((label, est) <- Seq("single-pass" -> est1, "merged" -> est2))
      assert(math.abs(est - 3000L) <= 3000 * 0.05,
        s"$label estimate $est strays >5% from the exact 3000")
  }

  test("top_k sketch keeps the true heavy hitters when the domain " +
      "overflows maxItemsTracked") {
    import org.apache.spark.sql.functions._
    // 3 heavy keys (5000 each) + 5000 singleton keys; capacity 64 <<
    // 5003 distincts. SpaceSaving guarantees any item with count >
    // n/capacity survives, and the heavy counts dominate the error
    // bound, so the top 3 must be exactly the heavy keys in order.
    val skew = ((1 to 15000).map(i => ("g", s"h${i % 3}")) ++
      (1 to 5000).map(i => ("g", s"t$i"))).toDF("g", "k")
    val out = agg(
      """{"name": "tk", "op": "top_k", "field": "k", "k": 3,
         "maxItemsTracked": 64}""", skew)
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.count")).collect()
    assert(out.length == 3)
    assert(out.map(_.getString(0)).toSet == Set("h0", "h1", "h2"),
      out.mkString(", "))
    out.foreach(r => assert(math.abs(r.getLong(1) - 5000L) <= 5000 / 10,
      s"heavy-hitter count ${r.getLong(1)} strays >10% from 5000"))
    // two-stage merge agrees with the one-pass sketch on the same data
    val pre = agg(
      """{"name": "sk", "op": "top_k_accumulate", "field": "k",
         "maxItemsTracked": 64}""",
      skew.withColumn("b", length(col("k")) % 4),
      groups = """["g", "b"]""")
    val merged = agg(
      """{"name": "m", "op": "top_k_combine", "field": "sk",
         "maxItemsTracked": 64}""", pre, groups = """["g"]""")
      .select(explode(call_function("approx_top_k_estimate",
        col("m"), lit(3))).as("e"))
      .select(col("e.item")).collect().map(_.getString(0)).toSet
    assert(merged == Set("h0", "h1", "h2"), merged.toString)
  }

  test("kll sketches: exact order statistics while n <= k, two-stage " +
      "merge equals single-pass, bounded rank error past capacity") {
    import graft.ops.SelectCompiler
    import graft.config.Json
    // 150 values, k=200 -> every value retained, quantiles exact
    val small = (1 to 150).map(i => ("g", i % 5, i.toDouble))
      .toDF("g", "b", "v")
    def quant(df: org.apache.spark.sql.DataFrame, field: String) =
      SelectCompiler(df, Json.parse(
        s"""[{"name": "g"},
            {"name": "q", "field": "$field", "func": "kll_quantile",
             "fraction": 0.5}]"""))
        .collect().head.getDouble(1)
    val onePass = agg(
      """{"name": "sk", "op": "kll_sketch", "field": "v"}""", small)
    assert(quant(onePass, "sk") == 75.0) // ceil(0.5*150) = 75th
    // two-stage: per-bucket sketches merged -> same exact value
    val staged = agg(
      """{"name": "sk2", "op": "kll_merge", "field": "sk"}""",
      agg("""{"name": "sk", "op": "kll_sketch", "field": "v"}""",
        small, groups = """["g", "b"]"""))
    assert(quant(staged, "sk2") == 75.0,
      "merged sketch must reproduce the single-pass quantile")
    // past capacity: normalized rank error within the published
    // ~1.65/sqrt(k) bound (x3 slack) for k=200 over 20k values
    val bigSk = agg(
      """{"name": "sk", "op": "kll_sketch", "field": "v", "k": 200}""",
      big)
    val est = quant(bigSk, "sk")
    assert(math.abs(est / 20000.0 - 0.5) < 3 * 1.65 / math.sqrt(200),
      s"median estimate $est outside the KLL rank-error bound")
  }

  test("kll_rank inverts kll_quantile: exact count(x <= v)/n while " +
      "the sketch is exact, null-safe, value param required") {
    import graft.ops.SelectCompiler
    import graft.config.Json
    val small = (1 to 150).map(i => ("g", i % 5, i.toDouble))
      .toDF("g", "b", "v")
    def rank(df: org.apache.spark.sql.DataFrame, v: Double) =
      SelectCompiler(df, Json.parse(
        s"""[{"name": "g"},
            {"name": "r", "field": "sk", "func": "kll_rank",
             "value": $v}]"""))
        .collect().head.getDouble(1)
    val sk = agg(
      """{"name": "sk", "op": "kll_sketch", "field": "v"}""", small)
    assert(rank(sk, 75.0) == 0.5) // 75 of 150 values <= 75
    assert(rank(sk, 150.0) == 1.0 && rank(sk, 0.5) == 0.0)
    val e = intercept[IllegalArgumentException] {
      SelectCompiler(sk, Json.parse(
        """[{"name": "r", "field": "sk", "func": "kll_rank"}]"""))
    }
    assert(e.getMessage.contains("value"))
  }

  test("count_distinct condition feeds only matching rows") {
    val df = Seq(("g", 1, 1.0), ("g", 1, 9.0), ("g", 2, 9.0),
      ("g", 3, 1.0)).toDF("g", "k", "v")
    val out = agg(
      """{"name": "hi", "op": "count_distinct", "field": "k",
         "condition": [{"key": "v", "op": ">", "value": 5}]}""", df)
      .collect().head
    assert(out.getAs[Long]("hi") == 2L) // k=1 (v=9) and k=2
  }
}
