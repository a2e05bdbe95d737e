package graft

import org.scalatest.funsuite.AnyFunSuite

/** vector_sum / vector_avg aggregation ops — oracled end-to-end by
  * q121 (mean-pooled embeddings per label vs per-position DuckDB
  * averages); these pin merge-across-partitions, null handling, the
  * dimension-mismatch guard, and the mergeable partial aggregate in
  * the plan. */
class VectorAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def agg(params: String, df: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("aggregation")(spark,
      Pipeline.ModuleCfg("a", "aggregation", Seq("in"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> df))("a")

  private val pool = """{"groupFields": ["k"], "aggregations":
    [{"input": "in", "fields": [
      {"name": "s", "op": "vector_sum", "field": "v"},
      {"name": "m", "op": "vector_avg", "field": "v"}]}]}"""

  test("vector_sum/vector_avg pool element-wise across partitions") {
    // 7 partitions over 3 rows forces reduce AND merge paths (empty
    // partition buffers merge as nulls)
    val df = Seq(
      ("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)), ("b", Seq(5.0, 6.0)))
      .toDF("k", "v").repartition(7)
    val m = agg(pool, df)
      .select("k", "s", "m")
      .as[(String, Seq[Double], Seq[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("a") == (Seq(4.0, 6.0), Seq(2.0, 3.0)))
    assert(m("b") == (Seq(5.0, 6.0), Seq(5.0, 6.0)))
  }

  test("null rows are skipped; null elements are excluded from that " +
      "position's mean denominator (SQL avg semantics per position)") {
    val df = Seq(
      ("a", Seq[java.lang.Double](2.0, null)),
      ("a", Seq[java.lang.Double](4.0, 6.0)),
      ("a", null))
      .toDF("k", "v")
    val m = agg(pool, df)
      .select("k", "s", "m")
      .as[(String, Seq[Double], Seq[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // sum treats null as contributing nothing: [6, 6]; avg divides
    // per position by the non-null count: [6/2, 6/1] = [3, 6]
    assert(m("a") == (Seq(6.0, 6.0), Seq(3.0, 6.0)))
    // a position with NO non-null contribution is a null ELEMENT of
    // the mean (DuckDB: avg of all-null = NULL)
    val oneNullPos = Seq(
      ("y", Seq[java.lang.Double](1.0, null)),
      ("y", Seq[java.lang.Double](3.0, null)))
      .toDF("k", "v")
    val ry = agg(pool, oneNullPos)
      .select("s", "m")
      .as[(Seq[java.lang.Double], Seq[java.lang.Double])]
      .collect().head
    assert(ry._1 == Seq[java.lang.Double](4.0, 0.0))
    assert(ry._2 == Seq[java.lang.Double](2.0, null))
    // an all-null group yields null vectors, not a crash
    val allNull = Seq(("z", null: Seq[java.lang.Double]))
      .toDF("k", "v")
    val r = agg(pool, allNull).select("s", "m").collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("mismatched dimensions fail loudly, naming the aggregate") {
    val df = Seq(("a", Seq(1.0, 2.0)), ("a", Seq(1.0, 2.0, 3.0)))
      .toDF("k", "v").coalesce(1)
    val e = intercept[org.apache.spark.SparkException](
      agg(pool, df).collect())
    assert(e.getMessage.contains("dimension mismatch")
      || Option(e.getCause).exists(
        _.getMessage.contains("dimension mismatch")))
  }

  test("ints and floats cast in; the aggregate partial-combines " +
      "below its shuffle") {
    val df = Seq(("a", Seq(1f, 2f)), ("a", Seq(3f, 4f)))
      .toDF("k", "v").repartition(2)
    val out = agg(pool, df)
    val m = out.select("k", "m").as[(String, Seq[Double])]
      .collect().toMap
    assert(m("a") == Seq(2.0, 3.0))
    // mergeable partial aggregate: two aggregate stages around the
    // exchange (ObjectHashAggregate for typed imperative aggs)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") ||
      p.contains("SortAggregate"), p.take(600))
    assert(p.split("Exchange").head.contains("Aggregate") ||
      p.contains("partial"), "no partial aggregate below the shuffle")
  }
}
