package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One shared local SparkSession for all suites. ANSI off: the engine
  * reproduces the reference's lenient cast / null-out semantics
  * (Spark 4 defaults ANSI on). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Robustness to the testdata's physical timestamp encoding:
      // Spark cannot read parquet TIMESTAMP(NANOS) natively, so if a
      // regeneration ever emits nanos again this surfaces the column
      // as int64 — which Strategy.toTimestamp/epochToTimestamp then
      // convert by magnitude. Harmless for micros/NTZ files (the conf
      // only affects genuinely-nanos columns).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** `events.parquet` with `ts` normalized to TimestampType whatever
    * the file's physical encoding (TIMESTAMP_MICROS, TIMESTAMP_NTZ,
    * or an integral epoch at ns/µs/ms/s magnitude). Fixtures built on
    * this survive driver-side testdata regenerations — a change of
    * parquet encoding once flipped ten specs red. */
  def events(path: String): DataFrame = {
    val df = spark.read.parquet(path)
    df.withColumn("ts", graft.streaming.Strategy.toTimestamp(df, "ts"))
  }
}
