package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** theta_sketch / theta_union aggs + theta_estimate / theta_intersect
  * / theta_difference select funcs — oracled end-to-end by q122
  * (exact-mode set algebra vs true distinct counts); these pin the
  * two-stage merge equivalence, known-set algebra, null handling,
  * and the approximate regime beyond the sampling threshold. */
class ThetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.functions.ThetaFunctions._

  test("set algebra on known sets is exact below the threshold") {
    // A = {0..99}, B = {50..149}: |A|=100, |A∩B|=50, |A\B|=50
    val a = spark.range(0, 100).select(col("id").cast("string").as("v"))
      .repartition(5)
    val b = spark.range(50, 150).select(col("id").cast("string").as("v"))
      .repartition(3)
    val ska = a.agg(thetaSketch(12, col("v")).as("sk"))
    val skb = b.agg(thetaSketch(12, col("v")).as("sk"))
    val pair = ska.crossJoin(skb.withColumnRenamed("sk", "sk2"))
    val row = pair.select(
      thetaEstimate(col("sk")).as("n"),
      thetaIntersect(col("sk"), col("sk2")).as("i"),
      thetaDifference(col("sk"), col("sk2")).as("d"))
      .as[(Double, Double, Double)].collect().head
    assert(row == ((100.0, 50.0, 50.0)))
  }

  test("union of per-part sketches equals the direct sketch") {
    val df = spark.range(0, 1000)
      .select((col("id") % 7).as("part"), col("id").cast("string").as("v"))
    val direct = df.agg(thetaSketch(12, col("v")).as("sk"))
      .select(thetaEstimate(col("sk"))).as[Double].collect().head
    val merged = df.groupBy(col("part"))
      .agg(thetaSketch(12, col("v")).as("sk"))
      .agg(thetaUnion(12, col("sk")).as("sk"))
      .select(thetaEstimate(col("sk"))).as[Double].collect().head
    assert(direct == 1000.0 && merged == 1000.0)
  }

  test("nulls: null values skip; estimate of a null sketch is null") {
    val df = Seq(Some("a"), None, Some("b"), Some("a"))
      .toDF("v")
    val est = df.agg(thetaSketch(12, col("v")).as("sk"))
      .select(thetaEstimate(col("sk"))).as[Double].collect().head
    assert(est == 2.0)
    val nul = Seq((null: Array[Byte], null: Array[Byte]))
      .toDF("a", "b")
    val r = nul.select(thetaEstimate(col("a")),
      thetaIntersect(col("a"), col("b")),
      thetaDifference(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("beyond the sampling threshold the estimate stays within the " +
      "published error") {
    // 100k distincts through a tiny lgK 10 sketch (1024 nominal):
    // rse ~ 1/sqrt(1024) ≈ 3.1%; assert within 5 sigma
    val df = spark.range(0, 100000)
      .select(col("id").cast("string").as("v")).repartition(8)
    val est = df.agg(thetaSketch(10, col("v")).as("sk"))
      .select(thetaEstimate(col("sk"))).as[Double].collect().head
    assert(math.abs(est - 100000.0) / 100000.0 < 0.16, s"est $est")
  }

  test("select-func guards: theta_intersect/difference demand two " +
      "fields") {
    val e = intercept[IllegalArgumentException] {
      graft.ops.SelectCompiler.compileField(
        graft.config.Json.parse(
          """{"name": "x", "func": "theta_intersect", "fields": ["a"]}"""),
        org.apache.spark.sql.types.StructType(Nil))
    }
    assert(e.getMessage.contains("needs fields"))
  }

  test("payload version envelope: wrap/unwrap roundtrip, legacy " +
      "unversioned accepted, future version fails loudly") {
    import graft.functions.SketchPayload
    val raw = Array[Byte](3, 1, 2, 3, 4)
    val w = SketchPayload.wrap(raw)
    assert(w.length == raw.length + 3)
    assert(w(0) == 'G'.toByte && w(1) == 'S'.toByte &&
      w(2) == SketchPayload.NormVersion)
    assert(java.util.Arrays.equals(SketchPayload.unwrap(w, "spec"), raw))
    // legacy payload (no magic) passes through with a one-time warn
    assert(java.util.Arrays.equals(
      SketchPayload.unwrap(raw, "spec-legacy"), raw))
    // a NEWER normalization version is incompatible by definition
    val fut = w.clone(); fut(2) = (SketchPayload.NormVersion + 1).toByte
    val e = intercept[IllegalArgumentException](
      SketchPayload.unwrap(fut, "spec-future"))
    assert(e.getMessage.contains("newer"))
    // e2e: a RAW DataSketches payload (a pre-envelope persisted
    // sketch) still estimates through thetaEstimate
    val upd = org.apache.datasketches.theta.UpdateSketch.builder.build()
    (1 to 50).foreach(i => upd.update(i.toString))
    val legacy = upd.compact.toByteArray
    val est = Seq(legacy).toDF("sk")
      .select(thetaEstimate(col("sk"))).as[Double].collect().head
    assert(math.abs(est - 50.0) < 1e-9, s"legacy est $est")
  }
}
