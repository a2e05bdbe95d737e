package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, count_min_sketch, lit}

/** cms_sketch / cms_merge aggs + cms_estimate select func — oracled
  * end-to-end by q146 (exact-regime point frequencies vs true
  * counts); these pin the two-stage merge equivalence, the
  * one-sided overestimate guarantee, cross-type normalization, and
  * the loud incompatible-merge failure. */
class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import graft.functions.CmsFunctions._
  import graft.functions.SketchNorm

  private def sk(df: org.apache.spark.sql.DataFrame, v: String,
      eps: Double = 1e-4) =
    df.agg(count_min_sketch(col(v), lit(eps), lit(0.999), lit(42))
      .as("sk"))

  test("exact-regime point frequencies match true counts") {
    // 100 keys with frequency id%10+1 shape; wide grid → no collisions
    val df = spark.range(0, 1000)
      .select((col("id") % 100).cast("string").as("v"))
      .repartition(7)
    val probes = spark.range(0, 100)
      .select(col("id").cast("string").as("p"))
    val est = probes.crossJoin(sk(df, "v"))
      .select(col("p"), cmsEstimate(col("sk"), col("p")).as("e"))
      .as[(String, Long)].collect().toMap
    assert((0 until 100).forall(i => est(i.toString) == 10L), est)
  }

  test("merge of per-part sketches equals the direct global sketch") {
    val df = spark.range(0, 2000)
      .select((col("id") % 5).as("part"),
        (col("id") % 50).cast("string").as("v"))
    val direct = sk(df, "v")
    val merged = df.groupBy(col("part"))
      .agg(count_min_sketch(col("v"), lit(1e-4), lit(0.999), lit(42))
        .as("sk"))
      .agg(cmsMerge(col("sk")).as("sk"))
    val probes = spark.range(0, 50)
      .select(col("id").cast("string").as("p"))
    val d = probes.crossJoin(direct)
      .select(cmsEstimate(col("sk"), col("p"))).as[Long].collect().toSeq
    val m = probes.crossJoin(merged)
      .select(cmsEstimate(col("sk"), col("p"))).as[Long].collect().toSeq
    assert(d == m && d.forall(_ == 40L))
  }

  test("coarse grids keep the one-sided guarantee: estimate >= " +
      "true count, always") {
    // eps 0.5 → width 4: heavy collisions by construction
    val df = spark.range(0, 500)
      .select((col("id") % 20).cast("string").as("v"))
    val probes = spark.range(0, 20)
      .select(col("id").cast("string").as("p"))
    val est = probes.crossJoin(sk(df, "v", eps = 0.5))
      .select(cmsEstimate(col("sk"), col("p"))).as[Long].collect()
    assert(est.forall(_ >= 25L), est.mkString(","))
  }

  test("cross-type normalization: a sketch built over int64 answers " +
      "probes from a double column of the same values") {
    val ints = spark.range(0, 100).select((col("id") % 10).as("v"))
    val skInt = ints.agg(count_min_sketch(
      SketchNorm.normalize(org.apache.spark.sql.types.LongType,
        col("v")),
      lit(1e-4), lit(0.999), lit(42)).as("sk"))
    val dblProbes = spark.range(0, 10)
      .select(col("id").cast("double").as("p"))
    val est = dblProbes.crossJoin(skInt)
      .select(cmsEstimate(col("sk"),
        SketchNorm.normalize(org.apache.spark.sql.types.DoubleType,
          col("p")))).as[Long].collect()
    assert(est.forall(_ == 10L), est.mkString(","))
  }

  test("decimal keys above 2^53 keep their exact identity (no " +
      "double round-trip) and agree with the integral rendering") {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val big = 9007199254740993L // 2^53 + 1: double collapses it
    val dec = Seq(BigDecimal(big), BigDecimal(big + 2)).toDF("v")
      .select($"v".cast(DecimalType(20, 0)).as("v"))
    val rendered = dec.select(SketchNorm.normalize(
      DecimalType(20, 0), $"v").as("s")).as[String].collect().toSet
    assert(rendered == Set(big.toString, (big + 2).toString), rendered)
    val fromLong = Seq(big).toDF("v")
      .select(SketchNorm.normalize(LongType, $"v").as("s"))
      .as[String].collect().head
    assert(rendered.contains(fromLong))
  }

  test("resolveType descends dotted struct paths so nested numerics " +
      "normalize like flat ones") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("payload", StructType(Seq(
        StructField("amount", DoubleType)))),
      StructField("a.b", LongType)))
    assert(SketchNorm.resolveType(schema, "payload.amount") ==
      DoubleType)
    assert(SketchNorm.resolveType(schema, "a.b") == LongType)
    assert(SketchNorm.resolveType(schema, "nope") == StringType)
  }

  test("merging sketches with different grids fails loudly") {
    val a = spark.range(0, 10).select(col("id").cast("string").as("v"))
    val s1 = sk(a, "v", eps = 1e-4)
    val s2 = a.agg(count_min_sketch(col("v"), lit(1e-2), lit(0.999),
      lit(42)).as("sk"))
    val e = intercept[Exception](
      s1.union(s2).agg(cmsMerge(col("sk")).as("m")).collect())
    val msg = Option(e.getCause).map(_.toString).getOrElse(e.toString)
    assert(msg.toLowerCase.contains("merge") ||
      e.toString.toLowerCase.contains("merge"), e.toString)
  }
}
