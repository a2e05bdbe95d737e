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
      // parquet TIMESTAMP(isAdjustedToUTC=false) surfaces as NTZ; the
      // engine's convention reads the wall-clock value as a UTC
      // instant. A bare cast interprets it in the SESSION zone — an
      // externally built SparkSession in a non-UTC zone would
      // silently shift every event time — so shift the wall time
      // into the session zone first; the cast then lands on the
      // original UTC instant in any session timezone (identity when
      // the session is UTC, as Verify/Bench/Run all configure).
      case Some(TimestampNTZType) =>
        val sessionTz =
          df.sparkSession.sessionState.conf.sessionLocalTimeZone
        if (sessionTz == "UTC") col(field).cast(TimestampType)
        else convert_timezone(lit("UTC"), lit(sessionTz), col(field))
          .cast(TimestampType)
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

  /** A streaming-safe window grouping: the groupBy Column plus a
    * post-aggregation projection (identity except for streaming
    * calendar windows, where the dynamic-gap session struct is
    * rewritten to the calendar bucket boundaries). */
  final case class GroupWindow(column: Column,
      post: DataFrame => DataFrame = identity)

  /** Window group Column for a strategy node, or None for global.
    * Kept for callers/tests that only need the grouping column; the
    * aggregation path uses [[windowGroup]] to also get the
    * post-aggregation projection. */
  def windowColumn(strategy: JsonNode, ts: Column,
      streaming: Boolean = false): Option[Column] =
    windowGroup(strategy, ts, streaming).map(_.column)

  def windowGroup(strategy: JsonNode, ts: Column,
      streaming: Boolean = false): Option[GroupWindow] = {
    val w = strategy("window").getOrElse(strategy)
    w.str("type").getOrElse("global") match {
      case "global" => None
      case "fixed" =>
        val size = seconds(w, "size").getOrElse(
          throw new IllegalArgumentException("fixed window requires size"))
        val off = seconds(w, "offset").getOrElse(0L)
        Some(GroupWindow(window(ts, dur(size), dur(size), dur(off))))
      case "sliding" =>
        val size = seconds(w, "size").getOrElse(
          throw new IllegalArgumentException("sliding window requires size"))
        val period = seconds(w, "period").getOrElse(
          throw new IllegalArgumentException(
            "sliding window requires period"))
        Some(GroupWindow(window(ts, dur(size), dur(period),
          dur(seconds(w, "offset").getOrElse(0L)))))
      case "session" =>
        val gap = seconds(w, "gap").getOrElse(
          throw new IllegalArgumentException("session window requires gap"))
        Some(GroupWindow(session_window(ts, dur(gap))))
      case "calendar" =>
        // month/year windows via date_trunc in the strategy timezone
        val tz = w.str("timezone").getOrElse("UTC")
        val unit = w.str("unit").getOrElse("day")
        val truncUnit = unit match {
          case "day" | "week" | "month" | "year" => unit.toUpperCase
          case other => throw new IllegalArgumentException(
            s"calendar unit: $other")
        }
        if (streaming) {
          // grouping by a bare date_trunc'd column loses the
          // watermark linkage (append mode then fails with a cryptic
          // Spark error). Two append-safe encodings instead:
          //  - day/week in a fixed-offset zone: true fixed windows
          //    offset to local midnight / local Monday — same
          //    buckets, cheapest state (one window struct per key).
          //  - everything else (month/year anywhere; day/week in DST
          //    zones): DYNAMIC-GAP session windows. Each event's gap
          //    extends exactly to the end of its local calendar
          //    bucket, so consecutive events of one bucket always
          //    overlap and merge into a single session per bucket,
          //    and an event of the next bucket can never reach back
          //    across the boundary. The per-event boundary math runs
          //    through from_utc/to_utc with full zone rules, so DST
          //    transitions (23h/25h days, variable month lengths)
          //    bucket identically to the batch date_trunc plan. The
          //    session struct's end IS the bucket end; the start is
          //    the first event's time, so `post` rewrites the struct
          //    to the true bucket boundaries after the aggregation.
          val rules = java.time.ZoneId.of(tz).getRules
          val now = java.time.Instant.now()
          // "effectively fixed": no DST rules and no scheduled offset
          // change ahead — Asia/Tokyo (last transition 1951) counts
          val fixedOffset = rules.isFixedOffset ||
            (rules.getTransitionRules.isEmpty &&
              rules.nextTransition(now) == null)
          (unit, fixedOffset) match {
            case ("day", true) =>
              val tzOff = rules.getOffset(now).getTotalSeconds
              val off = ((86400 - tzOff) % 86400 + 86400) % 86400
              Some(GroupWindow(window(ts, "1 day", "1 day", dur(off))))
            case ("week", true) => // epoch was a Thursday; Monday = +4d
              val tzOff = rules.getOffset(now).getTotalSeconds
              val wk = 7 * 86400
              val off = ((4 * 86400 - tzOff) % wk + wk) % wk
              Some(GroupWindow(window(ts, "7 days", "7 days", dur(off))))
            case _ =>
              val bucketStart = to_utc_timestamp(
                date_trunc(truncUnit, from_utc_timestamp(ts, tz)), tz)
              val bucketEnd = calendarBucketEnd(ts, truncUnit, tz)
              // gap in (fractional) seconds from this event to its
              // bucket end — always > 0 (an event ON the boundary
              // belongs to the NEXT bucket and gets that bucket's
              // full span)
              // sessions merge INCLUSIVELY on touching boundaries
              // (an event at exactly a prior session's end joins it),
              // so the gap ends 1µs BEFORE the bucket end or a
              // boundary-exact event of the next bucket would chain
              // backwards. Clamped to stay positive (a non-positive
              // dynamic gap makes Spark DROP the event): an event in
              // the bucket's last microsecond keeps a 1µs gap, which
              // ends exactly on the boundary — the one (sub-second-
              // pathological) case where a boundary-exact successor
              // would still merge.
              val gapSecs = (greatest(
                unix_micros(bucketEnd) - lit(1L) - unix_micros(ts),
                lit(1L)).cast("double") / lit(1e6)).cast("decimal(18,6)")
              // make_interval, not make_dt_interval: dynamic session
              // gaps must be CalendarIntervalType
              Some(GroupWindow(
                session_window(ts,
                  make_interval(lit(0), lit(0), lit(0), lit(0), lit(0),
                    lit(0), gapSecs)),
                post = df => df.withColumn("window", struct(
                  to_utc_timestamp(date_trunc(truncUnit,
                    from_utc_timestamp(col("window.start"), tz)), tz)
                    .as("start"),
                  // recompute the end from the bucket (window.start is
                  // an event time inside it) rather than trusting the
                  // raw session end's exact boundary encoding
                  calendarBucketEnd(col("window.start"), truncUnit, tz)
                    .as("end")))))
          }
        } else {
          val local = from_utc_timestamp(ts, tz)
          Some(GroupWindow(
            to_utc_timestamp(date_trunc(truncUnit, local), tz)
              .as("window_start")))
        }
      case other =>
        throw new IllegalArgumentException(s"window type: $other")
    }
  }

  /** UTC instant of the END of `ts`'s local calendar bucket:
    * date_trunc in the zone, plus one bucket, mapped back to UTC.
    * Interval addition happens in LOCAL wall time (that is the
    * definition of a calendar bucket), so "+1 MONTH" lands on the
    * next month's first midnight regardless of month length or DST. */
  private def calendarBucketEnd(ts: Column, truncUnit: String,
      tz: String): Column = {
    val localStart = date_trunc(truncUnit, from_utc_timestamp(ts, tz))
    val localEnd = truncUnit match {
      case "DAY" => localStart + expr("INTERVAL 1 DAY")
      case "WEEK" => localStart + expr("INTERVAL 7 DAY")
      case "MONTH" => localStart + expr("INTERVAL 1 MONTH")
      case "YEAR" => localStart + expr("INTERVAL 1 YEAR")
    }
    to_utc_timestamp(localEnd, tz)
  }

  /** Apply watermark from `allowedLateness` when the input streams.
    * Parquet timestamps usually surface as TIMESTAMP_NTZ, which
    * `withWatermark` rejects — cast to TimestampType first (session
    * tz is UTC, so the instant is unchanged). */
  /** `allowedLateness` in seconds from a strategy node — on the
    * window sub-node (reference Strategy.java nests it there) or the
    * strategy root. Shared by the watermark and by the discarding
    * pane engine's expired-window drop. */
  def allowedLatenessSeconds(strategy: JsonNode): Option[Long] =
    strategy("window").flatMap(w => seconds(w, "allowedLateness"))
      .orElse(seconds(strategy, "allowedLateness"))

  def applyWatermark(df: DataFrame, strategy: JsonNode,
      tsField: String): DataFrame =
    if (!df.isStreaming) df
    else {
      val lateness = allowedLatenessSeconds(strategy).getOrElse(0L)
      val cast =
        if (df.schema.fields.exists(f => f.name == tsField &&
            f.dataType != TimestampType))
          df.withColumn(tsField, toTimestamp(df, tsField))
        else df
      cast.withWatermark(tsField, dur(math.max(lateness, 1)))
    }
}
