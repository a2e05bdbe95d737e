package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** profile transform — oracled end-to-end by q112; these pin the
  * per-column stats on a hand-built frame, approx mode, non-atomic
  * skipping, and the guards. */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profile(params: String, df: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("profile")(spark,
      Pipeline.ModuleCfg("pf", "profile", Seq("in"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> df))("pf")

  private val df = Seq(
    (1L, Some(2.0), "x"),
    (2L, None, "y"),
    (3L, Some(4.0), "x"))
    .toDF("id", "v", "s")
    .withColumn("arr", array(col("id")))

  test("per-column stats match the hand computation; arrays skipped") {
    val out = profile("{}", df)
    val m = out.collect().map(r => r.getString(0) -> r).toMap
    assert(m.keySet == Set("id", "v", "s"), "array column must skip")
    val id = m("id")
    assert(id.getLong(1) == 3 && id.getLong(2) == 0 &&
      id.getLong(3) == 3)
    assert(id.getString(4) == "1" && id.getString(5) == "3")
    assert(math.abs(id.getDouble(6) - 2.0) < 1e-12)
    assert(math.abs(id.getDouble(7) - 1.0) < 1e-12) // sample stddev
    val v = m("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(math.abs(v.getDouble(6) - 3.0) < 1e-12)
    val s = m("s")
    assert(s.getLong(3) == 2 && s.getString(4) == "x" &&
      s.getString(5) == "y")
    assert(s.isNullAt(6) && s.isNullAt(7), "strings have no moments")
  }

  test("timestamps render like SQL engines; declared fields narrow " +
      "the profile; approx mode swaps in HLL") {
    val tdf = Seq(1L, 2L).toDF("id")
      .withColumn("ts", timestamp_seconds(col("id") * 86400))
    val out = profile("""{"fields": ["ts"]}""", tdf)
    val r = out.head()
    assert(r.getString(0) == "ts" && r.getString(4).startsWith("1970-01-0"))
    val ap = profile("""{"fields": ["id"], "approx": true}""", tdf)
    assert(ap.head().getLong(3) == 2L) // HLL exact at tiny cardinality
  }

  test("guards: unknown/non-atomic fields and streams fail actionably") {
    val e = intercept[IllegalArgumentException](
      profile("""{"fields": ["nope"]}""", df))
    assert(e.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException](
      profile("""{"fields": ["arr"]}""", df))
    assert(e2.getMessage.contains("non-atomic"))
    val s = spark.readStream.format("rate").load()
    val e3 = intercept[IllegalArgumentException](
      profile("""{"fields": ["value"]}""", s))
    assert(e3.getMessage.contains("batch"))
  }

  test("percentiles: exact KLL quantiles per numeric column in the " +
      "same pass, nulls for non-numerics, fraction-named columns") {
    // 1..100 → p50 = the ⌈0.5·100⌉ = 50th order statistic, p95 = 95,
    // p99.9 = ⌈99.9⌉ = 100 (KLL inclusive-search convention)
    val nums = (1 to 100).map(i => (i.toLong, i.toDouble, "c"))
      .toDF("id", "v", "s")
    val out = profile(
      """{"percentiles": [0.5, 0.95, 0.999]}""", nums)
    assert(out.columns.takeRight(3).toSeq ==
      Seq("p50", "p95", "p99_9"))
    val m = out.collect().map(r => r.getString(0) -> r).toMap
    assert(m("v").getDouble(8) == 50.0 &&
      m("v").getDouble(9) == 95.0 && m("v").getDouble(10) == 100.0)
    assert(m("id").getDouble(8) == 50.0)
    assert(m("s").isNullAt(8) && m("s").isNullAt(10),
      "non-numeric columns have no quantiles")
    // out-of-range fractions fail actionably
    val e = intercept[IllegalArgumentException](
      profile("""{"percentiles": [1.5]}""", nums))
    assert(e.getMessage.contains("out of (0, 1)"))
    // duplicate fractions would emit duplicate column names — an
    // ambiguous frame that breaks only downstream; fail at build
    val e2 = intercept[IllegalArgumentException](
      profile("""{"percentiles": [0.5, 0.50]}""", nums))
    assert(e2.getMessage.contains("duplicate percentiles"))
  }
}
