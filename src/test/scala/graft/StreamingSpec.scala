package graft

import graft.streaming.StreamRunner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** events with a real timestamp column for event-time tests. */
  private lazy val stagingDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
      .toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      .write.mode("overwrite").parquet(s"$dir/events")
    dir
  }

  test("file stream -> fixed window aggregation -> memory sink") {
    val config = s"""
      |sources:
      |  - name: ev
      |    module: storage
      |    timestampAttribute: ts
      |    parameters: {path: $stagingDir/events, stream: true}
      |transforms:
      |  - name: agg
      |    module: aggregation
      |    inputs: [ev]
      |    strategy:
      |      timestampField: ts
      |      window: {type: fixed, unit: hour, size: 6}
      |    parameters:
      |      groupFields: [event_type]
      |      aggregations:
      |        - input: ev
      |          fields:
      |            - {name: n, op: count}
      |            - {name: total, op: sum, field: value}
      |sinks:
      |  - name: windowed
      |    module: memory
      |    input: agg
      |    parameters: {outputMode: complete}
      |""".stripMargin
    Pipeline.execute(spark, config)
    StreamRunner.drainAll()
    val out = spark.sql("SELECT * FROM windowed")
    assert(out.columns.contains("window"))
    val n = out.agg(sum("n")).as[Long].head()
    assert(n == 1000L) // all events land in some window
    // windows are 6-hourly buckets
    val w = out.select($"window.start".cast("long")).distinct.as[Long]
      .collect()
    assert(w.forall(_ % 21600 == 0))
    StreamRunner.stopAll()
  }

  test("session window on batch input") {
    val config = s"""
      |sources:
      |  - name: ev
      |    module: storage
      |    parameters: {path: $stagingDir/events}
      |transforms:
      |  - name: agg
      |    module: aggregation
      |    inputs: [ev]
      |    strategy:
      |      timestampField: ts
      |      window: {type: session, unit: minute, gap: 30}
      |    parameters:
      |      groupFields: [user_id]
      |      aggregations:
      |        - input: ev
      |          fields:
      |            - {name: n, op: count}
      |""".stripMargin
    val dfs = Pipeline.build(spark, config)
    val out = dfs("agg")
    assert(out.columns.toSeq == Seq("window", "user_id", "n"))
    // sessions per user: every event accounted for
    assert(out.agg(sum("n")).as[Long].head() == 1000L)
    // session windows within a user never overlap
    val overlaps = out.select($"user_id", $"window.start".as("s"),
        $"window.end".as("e"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp)].collect()
      .groupBy(_._1).exists { case (_, ws) =>
        val sorted = ws.sortBy(_._2.getTime)
        sorted.zip(sorted.drop(1)).exists {
          case ((_, _, e1), (_, s2, _)) => s2.getTime < e1.getTime
        }
      }
    assert(!overlaps)
  }

  test("calendar window (day) matches date_trunc semantics") {
    val config = s"""
      |sources:
      |  - name: ev
      |    module: storage
      |    parameters: {path: $stagingDir/events}
      |transforms:
      |  - name: agg
      |    module: aggregation
      |    inputs: [ev]
      |    strategy:
      |      timestampField: ts
      |      window: {type: calendar, unit: day}
      |    parameters:
      |      aggregations:
      |        - input: ev
      |          fields:
      |            - {name: n, op: count}
      |""".stripMargin
    val dfs = Pipeline.build(spark, config)
    val got = dfs("agg").select($"window".cast("date").cast("string"), $"n")
      .as[(String, Long)].collect().toMap
    val exp = spark.read.parquet(s"$stagingDir/events")
      .groupBy(to_date($"ts").cast("string")).count()
      .as[(String, Long)].collect().toMap
    assert(got == exp)
  }

  test("rate source smoke: streaming plan builds") {
    val config = """
      |sources:
      |  - name: r
      |    module: rate
      |    parameters: {rowsPerSecond: 5}
      |transforms:
      |  - name: sel
      |    module: select
      |    inputs: [r]
      |    parameters:
      |      select:
      |        - {name: value}
      |        - {name: doubled, expression: "value * 2"}
      |""".stripMargin
    val dfs = Pipeline.build(spark, config)
    assert(dfs("sel").isStreaming)
  }
}
