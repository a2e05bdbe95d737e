package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming calendar windows: day/week in fixed-offset zones map to
  * append-safe fixed windows with local-midnight offsets (grouping by
  * a date_trunc'd column loses watermark linkage); month/year (and
  * day/week in DST zones) stream as dynamic-gap session windows whose
  * gap extends to the local bucket end — every bucket collapses to
  * one session and the post-projection restores bucket boundaries. */
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

  test("calendar month windows stream to a file sink and match the "
      + "batch date_trunc plan") {
    val in = Files.createTempDirectory("graft-cal-m-in")
    val out = Files.createTempDirectory("graft-cal-m-out").resolve("w")
    // the testdata spans a single month — spread deterministic copies
    // across four months so append mode has buckets to close
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.withColumn("ts",
        expr("timestampadd(MONTH, CAST(pmod(event_id, 4) AS INT), ts)"))
      .write.mode("overwrite").parquet(in.toString)
    Pipeline.execute(spark, config(in.toString, out.toString, "month"))
    graft.streaming.StreamRunner.drainAll()
    Thread.sleep(2000)
    graft.streaming.StreamRunner.drainAll()
    graft.streaming.StreamRunner.stopAll()
    val got = spark.read.parquet(out.toString)
    assert(got.count() > 0, "no month windows flushed")
    import org.apache.spark.sql.functions._
    val inDf = spark.read.parquet(in.toString)
    val batch = inDf
      .groupBy(date_trunc("MONTH", graft.streaming.Strategy
          .toTimestamp(inDf, "ts")).as("m"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // append mode can only have flushed buckets the watermark closed;
    // every flushed bucket must match the batch plan exactly, and the
    // bucket boundaries must be true month boundaries
    val joined = got.alias("s").join(batch.alias("b"),
      col("s.window.start") === col("b.m") &&
        col("s.event_type") === col("b.event_type"))
    assert(joined.filter(col("s.n") =!= col("b.n")).count() == 0)
    assert(joined.count() == got.count())
    assert(got.filter(
      col("window.end") =!= add_months(col("window.start"), 1)
        .cast("timestamp")).count() == 0)
  }

  test("streaming month sessions cannot leak across a bucket "
      + "boundary (boundary-exact event starts the next bucket)") {
    // one event exactly AT a month boundary plus events on both
    // sides: session merge semantics must keep the boundary event in
    // the NEXT month's session — if touching sessions merged, the
    // two months would collapse into one window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val in = Files.createTempDirectory("graft-cal-b-in")
    val out = Files.createTempDirectory("graft-cal-b-out").resolve("w")
    // NOTE an event in the bucket's final MICROSECOND (23:59:59.999999)
    // keeps the clamped 1µs gap and would still chain a boundary-exact
    // successor — the one documented pathological case (Strategy
    // calendar-session comment); one second before the boundary is the
    // realistic worst case and must not leak
    Seq(
      ("2024-01-30 23:00:00", "a"), ("2024-01-31 23:59:59", "a"),
      ("2024-02-01 00:00:00", "a"), ("2024-02-05 12:00:00", "a"),
      // a later month so the watermark closes January AND February
      ("2024-04-01 00:00:00", "a"))
      .toDF("s", "event_type")
      .withColumn("ts", to_timestamp($"s")).drop("s")
      .write.mode("overwrite").parquet(in.toString)
    Pipeline.execute(spark, config(in.toString, out.toString, "month"))
    graft.streaming.StreamRunner.drainAll()
    Thread.sleep(2000)
    graft.streaming.StreamRunner.drainAll()
    graft.streaming.StreamRunner.stopAll()
    val got = spark.read.parquet(out.toString)
      .select(col("window.start").cast("string").as("w"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(got.get("2024-01-01 00:00:00") == Some(2L),
      s"January bucket wrong: $got")
    assert(got.get("2024-02-01 00:00:00") == Some(2L),
      s"February bucket wrong: $got")
  }
}
