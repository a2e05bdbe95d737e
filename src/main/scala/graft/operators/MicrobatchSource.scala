package graft.operators

import graft.Pipeline.ModuleCfg
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.Json._

/** `microbatch` source (reference `source/MicrobatchQuery.java` +
  * `util/pipeline/MicroBatch.java`, docs
  * `docs/config/module/source/microbatch.md`): a time-ranged query
  * executed once per `intervalSecond`, with the range bounds injected
  * through the reference's predefined variables
  * (`__EVENT_EPOCH_SECOND_PRE__`, `__EVENT_EPOCH_SECOND__`, the
  * millisecond and ISO variants).
  *
  * Spark-first: a rate stream ticks once per interval; tick k maps
  * deterministically to the contiguous range
  * [start + k*interval, start + (k+1)*interval) clamped by
  * `gapSecond` behind wall-clock and `maxDurationMinute` — so ranges
  * need no external checkpoint state (Structured Streaming's own
  * checkpoint replays ticks exactly-once). Each tick runs the ranged
  * JDBC query inside the executor; the output schema comes from a
  * one-time driver-side WHERE 1=0 probe.
  *
  * Without `url`+`sql` the module falls back to the file-stream
  * behavior (new files per directory scan), the storage alias it had
  * before. `catchupIntervalSecond` is subsumed by Spark's own
  * micro-batch scheduling (a backlogged stream fires ticks
  * back-to-back).
  */
object MicrobatchSource {

  /** Inject the reference's predefined range variables. */
  def substitute(sql: String, preEpochSecond: Long,
      endEpochSecond: Long): String = sql
    .replace("${__EVENT_EPOCH_SECOND_PRE__}", preEpochSecond.toString)
    .replace("${__EVENT_EPOCH_SECOND__}", endEpochSecond.toString)
    .replace("${__EVENT_EPOCH_MILLISECOND_PRE__}",
      (preEpochSecond * 1000L).toString)
    .replace("${__EVENT_EPOCH_MILLISECOND__}",
      (endEpochSecond * 1000L).toString)
    .replace("${__EVENT_DATETIME_ISO_PRE__}",
      java.time.Instant.ofEpochSecond(preEpochSecond).toString)
    .replace("${__EVENT_DATETIME_ISO__}",
      java.time.Instant.ofEpochSecond(endEpochSecond).toString)

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val p = cfg.params
    val urlOpt = p.str("url")
    val sqlOpt = p.str("sql").orElse(p.str("query"))
    if (urlOpt.isEmpty || sqlOpt.isEmpty)
      return StorageSource.build(spark, cfg, inputs)
    val url = urlOpt.get
    val sql = sqlOpt.get
    val interval = p.int("intervalSecond").getOrElse(60).toLong
    val gap = p.int("gapSecond").getOrElse(30).toLong
    val maxDuration =
      p.int("maxDurationMinute").getOrElse(60).toLong * 60L
    val start = p.str("startDatetime")
      .map(s => java.time.Instant.parse(s).getEpochSecond)
      .getOrElse(System.currentTimeMillis() / 1000L)
    val user = p.str("user")
    val password = p.str("password")

    // one-time schema probe: empty-range query, driver side
    var probe = spark.read.format("jdbc").option("url", url)
      .option("query",
        s"SELECT * FROM (${substitute(sql, 0, 0)}) __probe WHERE 1=0")
    user.foreach(u => probe = probe.option("user", u))
    password.foreach(x => probe = probe.option("password", x))
    val schema = probe.load().schema
    val width = schema.length

    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .filter(col("value") % interval === 0)
    val out = ticks.mapPartitions { rows =>
      rows.flatMap { r =>
        val k = r.getAs[Long](1) / interval // (timestamp, value)
        val pre = start + k * interval
        val nowGap = System.currentTimeMillis() / 1000L - gap
        val end = math.min(math.min(pre + interval, pre + maxDuration),
          nowGap)
        if (end <= pre) Iterator.empty
        else {
          val props = new java.util.Properties()
          user.foreach(props.setProperty("user", _))
          password.foreach(props.setProperty("password", _))
          val conn = java.sql.DriverManager.getConnection(url, props)
          try {
            val rs = conn.createStatement()
              .executeQuery(substitute(sql, pre, end))
            val buf = Vector.newBuilder[Row]
            while (rs.next()) {
              val vals = new Array[Any](width)
              var i = 0
              while (i < width) { vals(i) = rs.getObject(i + 1); i += 1 }
              buf += Row.fromSeq(vals.toIndexedSeq)
            }
            buf.result().iterator
          } finally conn.close()
        }
      }
    }(Encoders.row(schema))
    SourceCommon.finish(out.toDF(), cfg)
  }
}
