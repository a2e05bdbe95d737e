package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `asof` transform — time-series as-of join (parity-plus: neither
  * the reference nor Spark has one; the prompt-level need is joining
  * each event to the temporally nearest dimension row, e.g. trades
  * to the latest quote at or before the trade).
  *
  * Inputs `[left, right]`; params: `by` (equality keys), `leftOn` /
  * `rightOn` (time fields; `on` sets both), `direction`
  * backward|forward|nearest (default backward = latest right at or
  * before left), `tolerance` (max time distance, seconds or
  * "30s/5m/1h/2d"), `rightPrefix` for the joined columns (default
  * `right_`). Unmatched left rows keep nulls (left-outer).
  *
  * Spark-first plan — no UDF, no custom physical operator: union the
  * two sides, then one window pass per direction:
  * `last(payload, ignoreNulls)` over rows UNBOUNDED PRECEDING with
  * right rows sorted BEFORE left rows at equal times reproduces the
  * inclusive backward as-of match; forward mirrors it with
  * `first(...)` over the following frame. ONE shuffle on the `by`
  * keys, sort within partitions via Spark's spillable external sort
  * — the same work a dedicated merge-scan as-of operator would do,
  * with AQE handling skewed keys. A `sortMergeJoin`-style
  * range-bucketing variant is unnecessary: the window never
  * materializes pairs, so there is no candidate blow-up to contain.
  */
object AsofJoinTransform {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Internal working column names per path — rejected on either
    * input of the path that uses them (a batch pipeline is not
    * broken by a column only the streaming path reserves). */
  val reservedBatch: Set[String] =
    Set("__t", "__side", "__rp", "__m", "__mt")
  val reservedStreaming: Set[String] = Set("__t", "__akey", "__idx",
    "__midx", "__rkey", "__ridx", "__tie")

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    require(cfg.inputs.size >= 2,
      s"asof ${cfg.name} requires 2 inputs (left, right)")
    val p = cfg.params
    val l = inputs(cfg.inputs(0))
    val r = inputs(cfg.inputs(1))
    require(!r.isStreaming,
      s"asof ${cfg.name}: the right side must be bounded — the " +
        "as-of match needs its full time axis (a streaming right " +
        "side has none); windows the right stream in a batch stage " +
        "first")
    val by = p.strArr("by")
    val leftOn = p.str("leftOn").orElse(p.str("on")).getOrElse(
      throw new IllegalArgumentException(
        s"asof ${cfg.name}: leftOn (or on) time field required"))
    val rightOn = p.str("rightOn").orElse(p.str("on")).getOrElse(leftOn)
    val direction = p.str("direction").getOrElse("backward")
    require(Set("backward", "forward", "nearest")(direction),
      s"asof direction: $direction (valid: backward, forward, nearest)")
    val tolerance = p.str("tolerance").map(parseSeconds)
      .orElse(p.dbl("tolerance"))
    val prefix = p.str("rightPrefix").getOrElse("right_")
    if (by.isEmpty) log.warn(
      s"asof ${cfg.name}: no 'by' keys — the global time sort runs " +
        "in a single partition; add equality keys at scale")

    // orderable time axis: timestamps → fractional epoch seconds,
    // numerics as-is; both sides must land on the same axis
    def tAxis(df: DataFrame, field: String, side: String): Column = {
      val dt = df.schema(field).dataType
      dt match {
        case TimestampType => col(field).cast(DoubleType)
        case TimestampNTZType => // UTC-wall-clock convention (README)
          col(field).cast(TimestampType).cast(DoubleType)
        case DateType => col(field).cast(TimestampType).cast(DoubleType)
        case _: NumericType => col(field).cast(DoubleType)
        case other => throw new IllegalArgumentException(
          s"asof ${cfg.name}: $side time field $field has " +
            s"non-temporal, non-numeric type $other")
      }
    }

    val payloadCols = r.columns.filterNot(by.contains).toSeq
    val collisions = payloadCols.map(prefix + _).intersect(l.columns.toSeq)
    require(collisions.isEmpty,
      s"asof ${cfg.name}: output columns ${collisions.mkString(", ")} " +
        "collide with left columns — set rightPrefix")
    // the engine's working columns would silently shadow same-named
    // input columns via withColumn — refuse, mirroring the prefix
    // check; scoped to the names the chosen path actually uses
    val reserved = if (l.isStreaming) AsofJoinTransform.reservedStreaming
      else AsofJoinTransform.reservedBatch
    val reservedHit = (l.columns ++ r.columns).distinct
      .filter(reserved.contains)
    require(reservedHit.isEmpty,
      s"asof ${cfg.name}: input columns ${reservedHit.mkString(", ")} " +
        "collide with the operator's reserved working names " +
        s"(${reserved.mkString(", ")}) — rename them " +
        "upstream (select rename)")
    if (l.isStreaming)
      return buildStreaming(spark, cfg, l, r, by, leftOn, rightOn,
        direction, tolerance, prefix, payloadCols, tAxis)

    val payload = struct(
      payloadCols.map(col) :+ tAxis(r, rightOn, "right").as("__mt"): _*)
    val lt = l
      .withColumn("__t", tAxis(l, leftOn, "left"))
      .withColumn("__side", lit(0))
    val rt = r.select(
      by.map(col) ++ Seq(payload.as("__rp"),
        tAxis(r, rightOn, "right").as("__t"), lit(1).as("__side")): _*)
    val u = lt.unionByName(rt, allowMissingColumns = true)

    // inclusive ties: the right row at t must be visible to the left
    // row at t — backward sorts right (side 1) first, forward last
    val back = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def within(m: Column, diff: Column): Column = tolerance match {
      case Some(tol) => when(m.isNotNull && diff <= tol, m)
      case None => m
    }
    val matched: Column = direction match {
      case "backward" =>
        within(last(col("__rp"), ignoreNulls = true).over(back),
          col("__t") - last(col("__rp"), ignoreNulls = true)
            .over(back).getField("__mt"))
      case "forward" =>
        within(first(col("__rp"), ignoreNulls = true).over(fwd),
          first(col("__rp"), ignoreNulls = true).over(fwd)
            .getField("__mt") - col("__t"))
      case "nearest" =>
        val b = within(last(col("__rp"), ignoreNulls = true).over(back),
          col("__t") - last(col("__rp"), ignoreNulls = true)
            .over(back).getField("__mt"))
        val f = within(first(col("__rp"), ignoreNulls = true).over(fwd),
          first(col("__rp"), ignoreNulls = true).over(fwd)
            .getField("__mt") - col("__t"))
        // tie (equal distance) prefers backward, like pandas
        when(b.isNull, f).when(f.isNull, b)
          .when(col("__t") - b.getField("__mt") <=
            f.getField("__mt") - col("__t"), b)
          .otherwise(f)
    }
    val out = u
      .withColumn("__m", matched)
      .filter(col("__side") === 0)
      .select(l.columns.map(col) ++ payloadCols.map(c =>
        col(s"__m.$c").as(prefix + c)): _*)
    TransformCommon.finishRouted(out, cfg)
  }

  /** Streaming-left as-of: the right side's (key, time) axis is
    * collected driver-side (count-guarded by `maxIndexRows`) into a
    * sorted per-key index; a scalar UDF binary-searches it to a row
    * ordinal and a broadcast equi-join on (key, ordinal) re-attaches
    * the payload. Map-side only — no watermark, no streaming state,
    * append-mode safe — so a trades stream enriches from a static
    * quotes table at scan rate. The index holds (key, double, int)
    * per right row, NOT payloads, so memory is ~24 B/row; payloads
    * travel in the broadcast join side.
    *
    * The static side is snapshot ONCE at build time (the reference's
    * side-input semantics); a right table that changes mid-stream
    * needs a pipeline restart. */
  private def buildStreaming(spark: SparkSession, cfg: ModuleCfg,
      l: DataFrame, r: DataFrame, by: Seq[String], leftOn: String,
      rightOn: String, direction: String, tolerance: Option[Double],
      prefix: String, payloadCols: Seq[String],
      tAxis: (DataFrame, String, String) => Column)
      : Map[String, DataFrame] = {
    val maxRows = cfg.params.long("maxIndexRows").getOrElse(2000000L)
    val cnt = r.count()
    require(cnt <= maxRows,
      s"asof ${cfg.name}: right side has $cnt rows, over " +
        s"maxIndexRows=$maxRows — the streaming as-of ships a " +
        "(key, time) index to every task; thin the right side (it " +
        "is a dimension by contract) or run the batch asof")
    def keyStr(df: DataFrame): Column =
      if (by.isEmpty) lit("")
      else concat_ws("\u0001",
        by.map(k => coalesce(col(k).cast(StringType), lit("\u0002"))): _*)
    // __idx is evaluated TWICE (driver-collected index + the broadcast
    // payload side), so the ordinal must be deterministic under
    // duplicate timestamps: tiebreak on the shared stable full-row
    // hash (rows still tied are interchangeable).
    val tie = TransformCommon.rowTie(r)
    val rIdx = r
      .withColumn("__t", tAxis(r, rightOn, "right"))
      .filter(col("__t").isNotNull)
      .withColumn("__akey", keyStr(r))
      .withColumn("__tie", tie)
      .withColumn("__idx", row_number().over(Window
        .partitionBy(col("__akey"))
        .orderBy(col("__t"), col("__tie"))))
    val index: Map[String, (Array[Double], Array[Int])] = rIdx
      .select("__akey", "__t", "__idx").collect()
      .groupBy(_.getString(0)).map { case (k, rows) =>
        val sorted = rows.sortBy(_.getInt(2))
        k -> (sorted.map(_.getDouble(1)), sorted.map(_.getInt(2)))
      }
    val bIndex = spark.sparkContext.broadcast(index)
    val tol = tolerance
    val dir = direction
    val findIdx = udf { (k: String, t: java.lang.Double) =>
      if (t == null) null
      else bIndex.value.get(k) match {
        case None => null
        case Some((ts, ids)) =>
          // last position with ts <= t (backward candidate)
          var lo = 0; var hi = ts.length - 1; var back = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (ts(mid) <= t) { back = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          val fwd = back + 1 // first position with ts > t; equal ts
          // land in `back`, which both directions treat as inclusive
          val fwdIn = if (back >= 0 && ts(back) == t) back
            else if (fwd < ts.length) fwd else -1
          def ok(i: Int, d: Double): Boolean =
            i >= 0 && tol.forall(d <= _)
          val pick = dir match {
            case "backward" =>
              if (ok(back, if (back >= 0) t - ts(back) else 0)) back
              else -1
            case "forward" =>
              if (fwdIn >= 0 && ok(fwdIn, ts(fwdIn) - t)) fwdIn else -1
            case _ => // nearest, distance tie prefers backward
              val bd = if (back >= 0) t - ts(back) else Double.MaxValue
              val fd = if (fwdIn >= 0) math.abs(ts(fwdIn) - t)
                else Double.MaxValue
              val i = if (bd <= fd) back else fwdIn
              if (ok(i, math.min(bd, fd))) i else -1
          }
          if (pick < 0) null else java.lang.Integer.valueOf(ids(pick))
      }
    }
    val lt = l
      .withColumn("__t", tAxis(l, leftOn, "left"))
      .withColumn("__akey", keyStr(l))
      .withColumn("__midx", findIdx(col("__akey"), col("__t")))
    val rPay = rIdx.select(Seq(col("__akey").as("__rkey"),
      col("__idx").as("__ridx")) ++ payloadCols.map(col): _*)
    val joined = lt.join(broadcast(rPay),
      lt("__akey") === rPay("__rkey") && lt("__midx") === rPay("__ridx"),
      "left")
    val out = joined.select(l.columns.map(lt(_)) ++
      payloadCols.map(c => rPay(c).as(prefix + c)): _*)
    TransformCommon.finishRouted(out, cfg)
  }

  /** "90"/"90s"/"5m"/"2h"/"1d" → seconds. */
  private[operators] def parseSeconds(s: String): Double = {
    val t = s.trim
    val (num, mult) = t.last match {
      case 's' => (t.dropRight(1), 1d)
      case 'm' => (t.dropRight(1), 60d)
      case 'h' => (t.dropRight(1), 3600d)
      case 'd' => (t.dropRight(1), 86400d)
      case _ => (t, 1d)
    }
    num.toDouble * mult
  }
}
