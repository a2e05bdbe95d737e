package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Event-time must be independent of the file's physical encoding.
  * A driver-side testdata regeneration once flipped events.ts from
  * int64-nanos to TIMESTAMP_MICROS and turned five gates and ten
  * specs red — this suite pins the invariant that the engine's
  * timestamp path (`Strategy.toTimestamp` magnitude detection +
  * typed-column passthrough) yields IDENTICAL windows for the same
  * instants stored as nanos-long, micros-long, millis-long,
  * seconds-long, TIMESTAMP_NTZ or TIMESTAMP. */
class TimestampEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowed(path: String): Set[(Long, String, Long)] = {
    val config = s"""
      |sources:
      |  - name: ev
      |    module: storage
      |    parameters: {path: "$path"}
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
      |          fields: [{name: n, op: count}]
      |""".stripMargin
    Pipeline.build(spark, config)("agg")
      .select($"window.start".cast("long"), $"event_type", $"n")
      .as[(Long, String, Long)].collect().toSet
  }

  test("identical fixed windows across six physical ts encodings") {
    val dir = Files.createTempDirectory("graft-tsenc").toString
    val base = TestSpark.events("/root/testdata/sf0.001/events.parquet")
      .select($"event_id", $"event_type", $"ts")
    // sub-second precision differs between variants (millis/seconds
    // truncate), but 6-hour buckets are unaffected — the invariant
    // under test is unit DETECTION, not sub-second rounding
    val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "ntz" -> base.withColumn("ts", $"ts".cast("timestamp_ntz")),
      "tz" -> base.withColumn("ts", $"ts".cast("timestamp")),
      "nanos" -> base.withColumn("ts", unix_micros($"ts") * 1000L),
      "micros" -> base.withColumn("ts", unix_micros($"ts")),
      "millis" -> base.withColumn("ts", unix_millis($"ts")),
      "secs" -> base.withColumn("ts", unix_seconds($"ts")))
    val results = variants.map { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$name")
      name -> windowed(s"$dir/$name")
    }
    val (refName, refWins) = results.head
    assert(refWins.nonEmpty)
    for ((name, wins) <- results.tail)
      assert(wins == refWins,
        s"encoding '$name' produced different windows than '$refName'")
  }

  test("testdata drift tripwire: events.ts surfaces as a SUPPORTED "
      + "encoding") {
    // the engine handles every encoding in this set identically (the
    // invariance test above proves it), so a testdata regeneration
    // within the set is fine and must NOT redden CI; only a type the
    // engine has no documented arm for fails. The Verify stderr probe
    // still prints the concrete encoding per round for drift
    // attribution.
    import org.apache.spark.sql.types._
    val supported: Set[DataType] =
      Set(TimestampNTZType, TimestampType, LongType, IntegerType)
    val dt = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .schema("ts").dataType
    assert(supported.contains(dt),
      s"events.parquet:ts surfaces as ${dt.simpleString}, which has " +
        "no Strategy.toTimestamp arm — teach the engine the new " +
        "encoding, then re-run the gate battery (dev/oracle_check.py)")
    // and the tripwire fires on a genuinely unknown type: a STRING
    // ts column is outside every documented arm
    val dir = Files.createTempDirectory("graft-trip").toString
    TestSpark.events("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", $"ts".cast("string"))
      .write.mode("overwrite").parquet(s"$dir/str")
    val drifted = spark.read.parquet(s"$dir/str").schema("ts").dataType
    assert(!supported.contains(drifted))
  }
}
