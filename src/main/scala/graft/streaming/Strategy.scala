package graft.streaming

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Json._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Windowing strategy — the Spark mapping of the reference's
  * per-module `strategy` block (`module/Strategy.java:118-218`):
  * `global | fixed(size) | sliding(size, period) | session(gap) |
  * calendar(day/week/month/year, timezone)` with `unit`
  * (second/minute/hour/day), `offset`, `allowedLateness`.
  *
  * Batch and streaming share this: `window()`/`session_window()` group
  * columns work in both; `allowedLateness` becomes `withWatermark` on
  * streaming inputs (SURVEY §2.9). Beam's early/late/composite
  * triggers and accumulating panes have no Structured Streaming
  * equivalent — output modes append/update are the documented
  * approximation; triggers are query-level (see StreamRunner).
  */
object Strategy {

  private val DurationLit = """(\d+)\s*(s|sec|second|seconds|m|min|minute|minutes|h|hour|hours|d|day|days)""".r

  private def seconds(node: JsonNode, field: String): Option[Long] = {
    // calendar strategies use `unit` for the BUCKET (day/week/month/
    // year), not as a duration multiplier — a numeric duration field
    // on a calendar node (offset, allowedLateness) is plain seconds;
    // otherwise {unit: day, allowedLateness: 600} silently meant 600
    // DAYS and {unit: week, ...} threw on a valid config
    val unit =
      if (node.str("type").contains("calendar")) "second"
      else node.str("unit").getOrElse("second")
    lazy val mult = unit match {
      case "second" => 1L
      case "minute" => 60L
      case "hour" => 3600L
      case "day" => 86400L
      case other =>
        throw new IllegalArgumentException(s"unknown time unit: $other")
    }
    node(field).map { v =>
      if (v.isNumber) v.asLong * mult
      else v.asText.trim match {
        // duration literal carries its own unit ("90s", "5m", "2h");
        // a bare numeric string uses the node's `unit`
        case s if s.matches("""\d+""") => s.toLong * mult
        case DurationLit(n, u) =>
          n.toLong * (u.head match {
            case 's' => 1L case 'm' => 60L case 'h' => 3600L
            case 'd' => 86400L
          })
        case other =>
          // asLong would silently yield 0 here (a "60 s" typo became
          // a zero-width window crash three modules later)
          throw new IllegalArgumentException(
            s"cannot parse duration '$other' for strategy field '$field'")
      }
    }
  }

  private def dur(s: Long): String = s"$s seconds"

  /** Numeric epoch → timestamp with unit detected by magnitude:
    * ns ≥ 1e17, µs ≥ 1e14, ms ≥ 1e11, else seconds — correct for any
    * real-world instant between 1973 and ~5000 in any of the four
    * units. A bare cast assumes SECONDS, so a nanos column (e.g.
    * parquet timestamp[ns] read under nanosAsLong) silently clamped
    * to +294247-01-10 (Long.MaxValue µs) and append-mode windows
    * never closed. */
  private[graft] def epochToTimestamp(c: Column): Column = {
    val a = abs(c)
    // integral div, NOT `/` (which promotes to double: at ~1.7e18 ns
    // the double ulp is ~256 ns, so truncation could land 1µs off an
    // exact integer-arithmetic replay at a window boundary)
    when(a >= 100000000000000000L,
        timestamp_micros(call_function("div", c.cast("long"), lit(1000L))))
      .when(a >= 100000000000000L, timestamp_micros(c.cast("long")))
      .when(a >= 100000000000L, timestamp_millis(c.cast("long")))
      .otherwise(c.cast(TimestampType))
  }

  private[graft] def toTimestamp(df: DataFrame, field: String): Column = {
    import org.apache.spark.sql.types.{IntegerType, LongType,
      TimestampNTZType}
    df.schema.fields.find(_.name == field).map(_.dataType) match {
      case Some(TimestampType) => col(field)
      case Some(LongType) | Some(IntegerType) => epochToTimestamp(col(field))
      // parquet TIMESTAMP(isAdjustedToUTC=false) surfaces as NTZ;
      // with the UTC session timezone the cast preserves the instant
      case Some(TimestampNTZType) => col(field).cast(TimestampType)
      case _ => col(field).cast(TimestampType)
    }
  }

  /** Event-time column for a module: explicit `timestampField`, else
    * the engine's `__event_time`, else null. The bare attribute is
    * used when it is already TimestampType — wrapping the watermarked
    * column in a (no-op) cast strips Spark's watermark tracking and
    * fails append-mode aggregations. */
  def eventTimeCol(df: DataFrame, node: JsonNode): Option[Column] =
    node.str("timestampField").map(f => toTimestamp(df, f))
      .orElse(
        if (df.columns.contains("__event_time"))
          Some(col("__event_time")) else None)

  /** Window group Column for a strategy node, or None for global.
    * `streaming` switches calendar day/week to append-safe fixed
    * windows (see the calendar case). */
  def windowColumn(strategy: JsonNode, ts: Column,
      streaming: Boolean = false): Option[Column] = {
    val w = strategy("window").getOrElse(strategy)
    w.str("type").getOrElse("global") match {
      case "global" => None
      case "fixed" =>
        val size = seconds(w, "size").getOrElse(
          throw new IllegalArgumentException("fixed window requires size"))
        val off = seconds(w, "offset").getOrElse(0L)
        Some(window(ts, dur(size), dur(size), dur(off)))
      case "sliding" =>
        val size = seconds(w, "size").getOrElse(
          throw new IllegalArgumentException("sliding window requires size"))
        val period = seconds(w, "period").getOrElse(
          throw new IllegalArgumentException(
            "sliding window requires period"))
        Some(window(ts, dur(size), dur(period),
          dur(seconds(w, "offset").getOrElse(0L))))
      case "session" =>
        val gap = seconds(w, "gap").getOrElse(
          throw new IllegalArgumentException("session window requires gap"))
        Some(session_window(ts, dur(gap)))
      case "calendar" =>
        // month/year windows via date_trunc in the strategy timezone
        val tz = w.str("timezone").getOrElse("UTC")
        val unit = w.str("unit").getOrElse("day")
        if (streaming) {
          // grouping by a date_trunc'd column loses the watermark
          // linkage (append mode then fails with a cryptic Spark
          // error), so streaming day/week map to true fixed windows
          // offset to local midnight / local Monday — same buckets,
          // append-safe; the group column is the standard window
          // struct. Standard (non-DST) offset of the zone; month/year
          // have no fixed duration and stay batch-only.
          // a fixed-size window can only model zones whose UTC offset
          // never changes: in a DST zone the streaming buckets would
          // silently shift 1h against the batch date_trunc plan for
          // half the year — reject loudly instead (mirrors the
          // month/year rejection below)
          val rules = java.time.ZoneId.of(tz).getRules
          val now = java.time.Instant.now()
          // "effectively fixed": no DST rules and no scheduled offset
          // change ahead — Asia/Tokyo (last transition 1951) passes,
          // America/New_York is rejected
          if (!rules.isFixedOffset &&
              (!rules.getTransitionRules.isEmpty ||
                rules.nextTransition(now) != null))
            throw new IllegalArgumentException(
              s"streaming calendar windows need a fixed-offset " +
                s"timezone ('$tz' observes DST/offset transitions, so " +
                "fixed 1-day buckets would drift from batch " +
                "date_trunc); use a fixed offset like UTC or +09:00, " +
                "or run this module in batch")
          val tzOff = rules.getOffset(now).getTotalSeconds
          unit match {
            case "day" =>
              val off = ((86400 - tzOff) % 86400 + 86400) % 86400
              Some(window(ts, "1 day", "1 day", dur(off)))
            case "week" => // epoch was a Thursday; Monday = +4 days
              val wk = 7 * 86400
              val off = ((4 * 86400 - tzOff) % wk + wk) % wk
              Some(window(ts, "7 days", "7 days", dur(off)))
            case other => throw new IllegalArgumentException(
              s"calendar unit '$other' has no fixed duration and " +
                "cannot stream in append mode — aggregate day windows " +
                "and roll up downstream, or run this module in batch")
          }
        } else {
          val local = from_utc_timestamp(ts, tz)
          val truncated = unit match {
            case "day" => date_trunc("DAY", local)
            case "week" => date_trunc("WEEK", local)
            case "month" => date_trunc("MONTH", local)
            case "year" => date_trunc("YEAR", local)
            case other => throw new IllegalArgumentException(
              s"calendar unit: $other")
          }
          Some(to_utc_timestamp(truncated, tz).as("window_start"))
        }
      case other =>
        throw new IllegalArgumentException(s"window type: $other")
    }
  }

  /** Apply watermark from `allowedLateness` when the input streams.
    * Parquet timestamps usually surface as TIMESTAMP_NTZ, which
    * `withWatermark` rejects — cast to TimestampType first (session
    * tz is UTC, so the instant is unchanged). */
  def applyWatermark(df: DataFrame, strategy: JsonNode,
      tsField: String): DataFrame =
    if (!df.isStreaming) df
    else {
      val lateness = strategy("window")
        .flatMap(w => seconds(w, "allowedLateness"))
        .orElse(seconds(strategy, "allowedLateness"))
        .getOrElse(0L)
      val cast =
        if (df.schema.fields.exists(f => f.name == tsField &&
            f.dataType != TimestampType))
          df.withColumn(tsField, toTimestamp(df, tsField))
        else df
      cast.withWatermark(tsField, dur(math.max(lateness, 1)))
    }
}
