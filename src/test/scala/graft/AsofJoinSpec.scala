package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Pipeline.ModuleCfg
import graft.operators.AsofJoinTransform

/** As-of join — backward is oracled end-to-end by q83 against
  * DuckDB's native ASOF JOIN; these pin forward/nearest directions,
  * inclusive ties, tolerance, and the guards. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val left = Seq((1, "k", 10L), (2, "k", 55L), (3, "k", 100L),
    (4, "z", 7L)).toDF("id", "g", "t")
  private val right = Seq(("k", 10L, "a"), ("k", 50L, "b"),
    ("k", 120L, "c")).toDF("g", "rt", "tag")

  private def asof(params: String,
      l: org.apache.spark.sql.DataFrame = left,
      r: org.apache.spark.sql.DataFrame = right) =
    AsofJoinTransform.build(spark,
      ModuleCfg("aj", "asof", Seq("l", "r"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("l" -> l, "r" -> r))("aj")

  private def tags(df: org.apache.spark.sql.DataFrame): Map[Int, String] =
    df.collect().map(row => row.getAs[Int]("id") ->
      row.getAs[String]("right_tag")).toMap

  test("backward matches latest at-or-before, inclusive, left-outer") {
    val m = tags(asof("""{"by":["g"],"leftOn":"t","rightOn":"rt"}"""))
    assert(m == Map(1 -> "a", // tie at t=10 matches inclusively
      2 -> "b", 3 -> "b", 4 -> null))
  }

  test("forward matches earliest at-or-after") {
    val m = tags(asof(
      """{"by":["g"],"leftOn":"t","rightOn":"rt",
         "direction":"forward"}"""))
    assert(m == Map(1 -> "a", 2 -> "c", 3 -> "c", 4 -> null))
  }

  test("nearest picks the closer side, backward on distance ties") {
    val l2 = Seq((1, "k", 30L), (2, "k", 110L), (3, "k", 85L))
      .toDF("id", "g", "t")
    val m = tags(asof(
      """{"by":["g"],"leftOn":"t","rightOn":"rt",
         "direction":"nearest"}""", l = l2))
    // t=30: back a (20 away) vs fwd b (20 away) -> tie -> backward a
    // t=110: back b (60) vs fwd c (10) -> c; t=85: b (35) .. c (35) -> b
    assert(m == Map(1 -> "a", 2 -> "c", 3 -> "b"))
  }

  test("tolerance nulls matches beyond the bound (unit suffixes)") {
    val m = tags(asof(
      """{"by":["g"],"leftOn":"t","rightOn":"rt","tolerance":"6s"}"""))
    assert(m == Map(1 -> "a", 2 -> "b", // 5s gap within 6s
      3 -> null, // 50s gap beyond
      4 -> null))
  }

  test("empty by runs a global as-of; colliding names need a prefix") {
    val m = tags(asof("""{"leftOn":"t","rightOn":"rt"}"""))
    assert(m(4) == null) // z's t=7 precedes every right row globally
    assert(m(2) == "b")
    val e = intercept[IllegalArgumentException](asof(
      """{"by":["g"],"leftOn":"t","rightOn":"rt","rightPrefix":""}""",
      r = right.withColumnRenamed("tag", "t")))
    assert(e.getMessage.contains("collide"))
  }

  test("streaming right side is rejected; oversized index errors " +
      "actionably") {
    val s = spark.readStream.format("rate").load()
      .selectExpr("'k' AS g", "value AS rt", "'x' AS tag")
    val e = intercept[IllegalArgumentException](asof(
      """{"by":["g"],"leftOn":"t","rightOn":"rt"}""", r = s))
    assert(e.getMessage.contains("bounded"))
    val stream = spark.readStream.format("rate").load()
      .selectExpr("CAST(value AS INT) AS id", "'k' AS g", "value AS t")
    val e2 = intercept[IllegalArgumentException](asof(
      """{"by":["g"],"leftOn":"t","rightOn":"rt","maxIndexRows":2}""",
      l = stream))
    assert(e2.getMessage.contains("maxIndexRows"))
  }

  test("streaming left enriches from the broadcast right index, " +
      "append-safe, all directions") {
    val dir = java.nio.file.Files.createTempDirectory("asof-str")
    val in = dir.resolve("in"); in.toFile.mkdirs()
    def stage(name: String, rows: Seq[(Int, String, Long)]): Unit = {
      val tmp = dir.resolve("tmp-" + name).toString
      rows.toDF("id", "g", "t").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, in.resolve(name + ".parquet"))
    }
    stage("b1", Seq((1, "k", 10L), (2, "k", 55L)))
    val schema = "id INT, g STRING, t BIGINT"
    val stream = spark.readStream.schema(schema)
      .parquet(in.toString)
    val out = asof(
      """{"by":["g"],"leftOn":"t","rightOn":"rt",
         "direction":"nearest","tolerance":"40s"}""", l = stream)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("asof_mem")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stage("b2", Seq((3, "k", 119L), (4, "z", 7L)))
      q.processAllAvailable()
      val m = spark.table("asof_mem").collect()
        .map(r => r.getAs[Int]("id") -> r.getAs[String]("right_tag"))
        .toMap
      // t=10 tie -> a; t=55 nearest is b (5 vs 65); t=119 -> c
      // (1 away); z has no right rows
      assert(m == Map(1 -> "a", 2 -> "b", 3 -> "c", 4 -> null))
    } finally q.stop()
  }
}
