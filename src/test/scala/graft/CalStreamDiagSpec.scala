package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming calendar windows: day/week map to append-safe fixed
  * windows with local-midnight offsets (grouping by a date_trunc'd
  * column loses watermark linkage); month/year raise actionably. */
class CalStreamDiagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def config(in: String, out: String, unit: String) = s"""
    |sources:
    |  - name: ev
    |    module: storage
    |    parameters: {path: "$in", format: parquet, stream: true}
    |transforms:
    |  - name: agg
    |    module: aggregation
    |    inputs: [ev]
    |    strategy:
    |      timestampField: ts
    |      window: {type: calendar, unit: $unit}
    |    parameters:
    |      groupFields: [event_type]
    |      aggregations:
    |        - input: ev
    |          fields: [{name: n, op: count}]
    |sinks:
    |  - name: snk
    |    module: storage
    |    inputs: [agg]
    |    parameters: {path: "$out", format: parquet,
    |                 checkpointLocation: "$in-ckpt-$unit"}
    |""".stripMargin

  test("calendar day windows stream to a file sink and match the "
      + "batch date_trunc plan") {
    val in = Files.createTempDirectory("graft-cal-in")
    val out = Files.createTempDirectory("graft-cal-out").resolve("w")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(in.toString)
    Pipeline.execute(spark, config(in.toString, out.toString, "day"))
    graft.streaming.StreamRunner.drainAll()
    Thread.sleep(2000)
    graft.streaming.StreamRunner.drainAll()
    graft.streaming.StreamRunner.stopAll()
    val got = spark.read.parquet(out.toString)
    assert(got.count() > 0, "no day windows flushed")
    import org.apache.spark.sql.functions._
    // batch truth: date_trunc day counts (UTC)
    val inDf = spark.read.parquet(in.toString)
    val batch = inDf
      .groupBy(date_trunc("DAY", graft.streaming.Strategy
          .toTimestamp(inDf, "ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val joined = got.alias("s").join(batch.alias("b"),
      col("s.window.start") === col("b.d") &&
        col("s.event_type") === col("b.event_type"))
    assert(joined.filter(col("s.n") =!= col("b.n")).count() == 0)
    assert(joined.count() == got.count())
  }

  test("calendar month streaming raises an actionable error") {
    val in = Files.createTempDirectory("graft-cal-m-in")
    val out = Files.createTempDirectory("graft-cal-m-out").resolve("w")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(in.toString)
    val e = intercept[IllegalArgumentException] {
      Pipeline.execute(spark, config(in.toString, out.toString, "month"))
    }
    assert(e.getMessage.contains("no fixed duration"))
  }
}
