package graft

import graft.config.Json
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression tests for operator-core review findings: calendar
  * duration units, windowed multi-input aggregation merge, dynamic
  * destination append, config validation, crypto key bytes. */
class ReviewFixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("calendar `unit` is a bucket, not a duration multiplier") {
    import graft.streaming.Strategy
    // {unit: week, allowedLateness: 3600} used to throw "unknown time
    // unit: week"; {unit: day, allowedLateness: 600} meant 600 DAYS
    val node = Json.parse(
      """{"window": {"type": "calendar", "unit": "week",
         "allowedLateness": 3600}}""")
    val rate = spark.readStream.format("rate").load()
      .withColumn("ts", col("timestamp"))
    val wm = Strategy.applyWatermark(rate, node, "ts")
    // 3600 seconds (normalized to "1 hours"), not 3600 weeks
    val plan = wm.queryExecution.logical.toString
    assert(plan.contains("1 hours"), plan)
    // fixed windows still honor unit as a multiplier
    val fixedNode = Json.parse(
      """{"window": {"type": "fixed", "unit": "hour", "size": 6}}""")
    val w = Strategy.windowColumn(fixedNode, col("ts")).get
    assert(w.toString.contains("21600"), w.toString)
  }

  test("sliding window missing period raises a pointed error") {
    import graft.streaming.Strategy
    val e = intercept[IllegalArgumentException] {
      Strategy.windowColumn(
        Json.parse("""{"window": {"type": "sliding", "size": "1h"}}"""),
        col("ts"))
    }
    assert(e.getMessage.contains("sliding window requires period"))
  }

  test("multi-input windowed aggregation merges on window + keys") {
    val dir = java.nio.file.Files.createTempDirectory("aggw").toString
    // two inputs, same key, two distinct hours -> the merge must pair
    // rows per (window, key), not cross-pair windows
    Seq(("a", "2024-01-01 00:10:00", 1.0), ("a", "2024-01-01 01:10:00", 2.0))
      .toDF("k", "ts", "v")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/x")
    Seq(("a", "2024-01-01 00:20:00", 10.0), ("a", "2024-01-01 01:20:00", 20.0))
      .toDF("k", "ts", "w")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/y")
    val out = Pipeline.build(spark, s"""
      |sources:
      |  - name: x
      |    module: storage
      |    parameters: {path: "$dir/x"}
      |  - name: y
      |    module: storage
      |    parameters: {path: "$dir/y"}
      |transforms:
      |  - name: agg
      |    module: aggregation
      |    inputs: [x, y]
      |    strategy:
      |      timestampField: ts
      |      window: {type: fixed, unit: hour, size: 1}
      |    parameters:
      |      groupFields: [k]
      |      aggregations:
      |        - input: x
      |          fields: [{name: sv, op: sum, field: v}]
      |        - input: y
      |          fields: [{name: sw, op: sum, field: w}]
      |""".stripMargin)("agg")
    // one merged row per (window, key): 2 windows x 1 key = 2 rows,
    // one 'window' column, values paired within their own hour
    assert(out.columns.count(_ == "window") === 1)
    val rows = out.orderBy("window")
      .select("sv", "sw").as[(Double, Double)].collect().toSeq
    assert(rows === Seq((1.0, 10.0), (2.0, 20.0)))
  }

  test("aggregation names an unknown input loudly") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark, """
        |sources:
        |  - name: a
        |    module: create
        |    parameters:
        |      elements: [{id: 1}]
        |      schema: {fields: [{name: id, type: int64}]}
        |transforms:
        |  - name: agg
        |    module: aggregation
        |    inputs: [a]
        |    parameters:
        |      aggregations:
        |        - input: nope
        |          fields: [{name: n, op: count}]
        |""".stripMargin)
    }
    assert(e.getMessage.contains("unknown input 'nope'"))
  }

  test("dynamic destination append preserves earlier runs' data") {
    val dir = java.nio.file.Files.createTempDirectory("dynappend")
      .toString
    def run(ids: Seq[Int]): Unit = Pipeline.execute(spark, s"""
      |sources:
      |  - name: src
      |    module: create
      |    parameters:
      |      elements: [${ids.map(i => s"""{id: $i, d: "x"}""").mkString(", ")}]
      |      schema:
      |        fields:
      |          - {name: id, type: int64}
      |          - {name: d, type: string}
      |sinks:
      |  - name: snk
      |    module: storage
      |    input: src
      |    parameters:
      |      output: "$dir/out/$${d}"
      |      format: json
      |      mode: append
      |""".stripMargin)
    run(Seq(1, 2))
    run(Seq(3))
    val back = spark.read.json(s"$dir/out/x")
    assert(back.select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L))
  }

  test("partition module with no partitions raises, not NoSuchElement") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark, """
        |sources:
        |  - name: a
        |    module: create
        |    parameters:
        |      elements: [{id: 1}]
        |      schema: {fields: [{name: id, type: int64}]}
        |transforms:
        |  - name: p
        |    module: partition
        |    inputs: [a]
        |    parameters: {partitions: []}
        |""".stripMargin)
    }
    assert(e.getMessage.contains("requires partitions"))
  }

  test("crypto validates the key's UTF-8 byte length") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark, """
        |sources:
        |  - name: a
        |    module: create
        |    parameters:
        |      elements: [{s: "x"}]
        |      schema: {fields: [{name: s, type: string}]}
        |transforms:
        |  - name: c
        |    module: crypto
        |    inputs: [a]
        |    parameters: {mode: encrypt, key: "0123456789abcdéü", fields: [s]}
        |""".stripMargin)
    }
    assert(e.getMessage.contains("UTF-8 bytes"))
  }
}
