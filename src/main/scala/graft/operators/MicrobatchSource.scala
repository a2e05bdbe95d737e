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
  * Spark-first: a per-second rate stream drives range emission. Tick
  * timestamps are deterministic under checkpoint replay, so each tick
  * computes exactly the ranges whose end moved `gapSecond` behind the
  * tick time since the previous tick (the first tick emits the whole
  * backlog since `startDatetime` — catch-up). Ranges are contiguous
  * [start+(k-1)*I, start+k*I) windows clamped by `maxDurationMinute`;
  * no external checkpoint state is needed. Each range runs the JDBC
  * query inside the executor; the output schema comes from a one-time
  * driver-side WHERE 1=0 probe. Set `startDatetime` explicitly for
  * restart determinism — the default is the build-time clock, so a
  * restarted driver re-anchors ranges.
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

  /** Ranges [pre, end) that became safe at the tick with timestamp
    * `tickEpochSecond` / value `tickValue` (both deterministic under
    * checkpoint replay). Range k (1-based) is
    * [start+(k-1)*interval, start+k*interval), safe once its end is
    * `gap` behind the tick time; the first tick emits the whole
    * backlog; long ranges clamp to the trailing `maxDuration`. */
  def tickRanges(tickEpochSecond: Long, tickValue: Long, start: Long,
      interval: Long, gap: Long, maxDuration: Long): Seq[(Long, Long)] = {
    def safeUpTo(ts: Long): Long =
      math.max(0L, (ts - gap - start) / interval)
    val safe = safeUpTo(tickEpochSecond)
    val prevSafe =
      if (tickValue == 0L) 0L else safeUpTo(tickEpochSecond - 1)
    (prevSafe + 1 to safe).map { k =>
      val end = start + k * interval
      (math.max(start + (k - 1) * interval, end - maxDuration), end)
    }
  }

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
        // alias must start with a letter: Derby/Oracle reject
        // leading-underscore ordinary identifiers
        s"SELECT * FROM (${substitute(sql, 0, 0)}) graft_probe WHERE 1=0")
    user.foreach(u => probe = probe.option("user", u))
    password.foreach(x => probe = probe.option("password", x))
    val schema = probe.load().schema
    val width = schema.length

    // typed getters matched to the probed schema: getObject would
    // surface CLOB handles for the CLOB columns Spark's own jdbc
    // writer creates from strings, and box SMALLINT/REAL as the
    // JVM types of the driver's choosing — either breaks the row
    // encoder at runtime, after the plan already validated
    val types = schema.fields.map(_.dataType)
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
    val out = ticks.mapPartitions { rows =>
      import org.apache.spark.sql.types._
      def get(rs: java.sql.ResultSet, i: Int, t: DataType): Any = {
        val v = t match {
          case StringType => rs.getString(i)
          case BinaryType => rs.getBytes(i)
          case TimestampType => rs.getTimestamp(i)
          case DateType => rs.getDate(i)
          case ByteType => rs.getByte(i)
          case ShortType => rs.getShort(i)
          case IntegerType => rs.getInt(i)
          case LongType => rs.getLong(i)
          case FloatType => rs.getFloat(i)
          case DoubleType => rs.getDouble(i)
          case BooleanType => rs.getBoolean(i)
          case _: DecimalType => rs.getBigDecimal(i)
          case _ => rs.getObject(i)
        }
        if (rs.wasNull()) null else v
      }
      rows.flatMap { r =>
        // tick (timestamp, value): timestamp is deterministic under
        // checkpoint replay (streamStart + value seconds) — never
        // consult the wall clock here. Range k (1-based) is
        // [start+(k-1)*I, start+k*I); it becomes safe once its end is
        // gapSecond behind the tick time. Each tick emits the ranges
        // that became safe since the previous tick; the FIRST tick
        // (value 0) emits the whole backlog since startDatetime.
        val t = r.getTimestamp(0).getTime / 1000L
        val v = r.getLong(1)
        tickRanges(t, v, start, interval, gap, maxDuration)
          .iterator.flatMap { case (pre, end) =>
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
              while (i < width) {
                vals(i) = get(rs, i + 1, types(i)); i += 1
              }
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
