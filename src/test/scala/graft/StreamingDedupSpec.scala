package graft

import graft.streaming.StreamRunner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: first-seen-wins within the watermark
  * horizon (`dropDuplicatesWithinWatermark` keyed on the text
  * fingerprint), state bounded by the event-time horizon. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stage(dir: String, file: String,
      rows: Seq[(Long, Long, String)]): Unit = {
    val tmp = s"$dir/tmp-$file"
    rows.toDF("id", "secs", "text")
      .select($"id", timestamp_seconds($"secs").as("ts"), $"text")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val inDir = new java.io.File(s"$dir/in")
    inDir.mkdirs()
    java.nio.file.Files.move(part.toPath,
      new java.io.File(inDir, s"$file.parquet").toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("streaming exact dedup keeps first occurrence, drops " +
      "within-horizon duplicates, keeps distinct texts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup")
      .toString
    // batch 1: X at t=100 and Y at t=200
    stage(dir, "b1", Seq((1L, 100L, "text X"), (2L, 200L, "text Y")))
    Pipeline.execute(spark, s"""
      |sources:
      |  - name: ev
      |    module: storage
      |    parameters: {path: $dir/in, stream: true}
      |transforms:
      |  - name: dd
      |    module: dedup
      |    inputs: [ev]
      |    strategy: {timestampField: ts, allowedLateness: 3600}
      |    parameters: {method: exact, field: text}
      |sinks:
      |  - name: sdd
      |    module: memory
      |    input: dd
      |    parameters: {outputMode: append}
      |""".stripMargin)
    StreamRunner.drainAll()
    def ids(): Seq[Long] =
      spark.sql("SELECT id FROM sdd").as[Long].collect().sorted.toSeq
    assert(ids() == Seq(1L, 2L))
    // batch 2: X again at t=500 (within the 1h horizon of the first
    // X) — dropped; Z at t=600 — new, kept
    stage(dir, "b2", Seq((3L, 500L, "text X"), (4L, 600L, "text Z")))
    StreamRunner.drainAll()
    assert(ids() == Seq(1L, 2L, 4L))
    // batch 3: another within-horizon X duplicate plus a new text —
    // dedup state still holds X (watermark = 600 - 3600 < 100)
    stage(dir, "b3", Seq((5L, 700L, "text X"), (6L, 800L, "text W")))
    StreamRunner.drainAll()
    assert(ids() == Seq(1L, 2L, 4L, 6L))
    StreamRunner.stopAll()
  }

  test("streaming exact dedup without a timestampField fails " +
      "actionably; non-exact methods still reject streams") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup2")
      .toString
    stage(dir, "b1", Seq((1L, 100L, "x")))
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: ev
        |    module: storage
        |    parameters: {path: $dir/in, stream: true}
        |transforms:
        |  - name: dd
        |    module: dedup
        |    inputs: [ev]
        |    parameters: {method: exact, field: text}
        |""".stripMargin)
    }
    assert(e.getMessage.contains("timestampField"))
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: ev
        |    module: storage
        |    parameters: {path: $dir/in, stream: true}
        |transforms:
        |  - name: dd
        |    module: dedup
        |    inputs: [ev]
        |    strategy: {timestampField: ts}
        |    parameters: {method: minhash, field: text}
        |""".stripMargin)
    }
    assert(e2.getMessage.contains("bounded"))
  }
}
