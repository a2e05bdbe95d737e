package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.expr.{ExprCompiler, ExprParser}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `window` transform — the batch form of the reference's stateful
  * select functions (`util/pipeline/select/stateful/Lag.java`,
  * `StatefulFunction.java:20-127`: per-key event-time-ordered buffers
  * with `range{count|duration}` frames) plus the `processing`
  * transform's per-key processors (`ProcessingTransform.java`).
  *
  * Spark mapping (SURVEY §2.7): `Window.partitionBy(groupFields)
  * .orderBy(orderField)` with `rowsBetween`/`rangeBetween` frames.
  * Ranking funcs (row_number/rank/...) are exposed too — free in
  * Spark, absent in the reference.
  *
  * `expression` fields may use `field[k]` refs, which resolve to
  * `lag(field, k)` over the window — the reference's lag-buffer
  * indexing semantic (`Lag.java:16-60`).
  */
object WindowTransform {
  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    var df = TransformCommon.single(cfg, inputs)
    val p = cfg.params
    TransformCommon.requireBatch(df, "window", cfg.name,
      "analytic window functions rank over a key's complete "
        + "partition, which a stream never finishes",
      "Use the stateful module for streaming lag, the limit module "
        + "for streaming per-key first-N, or strategy windows for "
        + "event-time aggregation.")
    // the deprecated `processing` alias declares per-stage `steps`
    // (ProcessingTransform.java:47-139), executed SEQUENTIALLY, each
    // stage over its OWN groupFields (falling back to the top-level
    // ones). Merging all stages into one window spec would silently
    // compute different results when stages disagree on keys.
    val topFields = p.arrOf("fields")
    val stages = p.arrOf("stages")
    require(topFields.nonEmpty || stages.nonEmpty,
      s"window module ${cfg.name} requires fields " +
        s"(got: ${p.names.mkString(", ")})")
    val stageList: Seq[(Seq[String], Seq[com.fasterxml.jackson.databind.JsonNode])] =
      (if (topFields.nonEmpty) Seq((p.strArr("groupFields"), topFields))
       else Nil) ++
        stages.map { s =>
          val sk = s.strArr("groupFields")
          (if (sk.nonEmpty) sk else p.strArr("groupFields"),
            s.arrOf("steps"))
        }
    val orderField = p.str("orderField")
    stageList.foreach { case (keys, fields) =>
      val orderType: Option[DataType] =
        orderField.flatMap(f => df.schema.find(_.name == f).map(_.dataType))
          .orElse(if (df.columns.contains("__event_time"))
            df.schema.find(_.name == "__event_time").map(_.dataType)
          else None)
      val orderCol: Column = orderField.map(col).getOrElse(
        if (df.columns.contains("__event_time")) col("__event_time")
        else monotonically_increasing_id())
      // an EMPTY partition key list single-partitions the whole frame
      // (a global window genuinely needs a global order) — correct
      // for global ranking, a driver-killer at 100 TB when it's an
      // accidental omission of groupFields. Require the explicit
      // `global: true` opt-in so the single-partition path is always
      // a stated choice.
      require(keys.nonEmpty || p.bool("global").getOrElse(false),
        s"window module ${cfg.name}: no groupFields — a window with " +
          "no partition keys runs in ONE partition (the whole input " +
          "moves through a single task). Set groupFields, or opt in " +
          "to a global window explicitly with global: true")
      val baseW =
        if (keys.nonEmpty)
          Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
        else Window.partitionBy().orderBy(orderCol)
      fields.foreach { f =>
        val name = f.str("name").getOrElse(
          throw new IllegalArgumentException("window field requires name"))
        df = df.withColumn(name,
          compileField(f, df.schema, baseW, orderCol, orderType))
      }
    }
    TransformCommon.finishRouted(df, cfg)
  }

  private def frame(f: com.fasterxml.jackson.databind.JsonNode,
      baseW: WindowSpec, orderCol: Column,
      orderType: Option[DataType]): WindowSpec =
    f("range") match {
      case Some(r) =>
        (r.int("count"), r.int("duration")) match {
          case (Some(n), _) =>
            baseW.rowsBetween(-(n.toLong - 1), Window.currentRow)
          case (_, Some(seconds)) =>
            // duration frame needs a numeric order key. unix_timestamp
            // on a numeric column parses it as a date STRING → null →
            // the frame orders on all-null keys, so branch on type:
            // numeric columns order as-is (duration in the column's
            // own unit), timestamps via unix_micros (sub-second safe),
            // strings/dates via parse.
            orderType match {
              case Some(_: NumericType) =>
                baseW.orderBy(orderCol)
                  .rangeBetween(-seconds.toLong, Window.currentRow)
              case Some(TimestampType) | Some(TimestampNTZType) =>
                baseW.orderBy(unix_micros(orderCol.cast(TimestampType)))
                  .rangeBetween(-seconds.toLong * 1000000L,
                    Window.currentRow)
              case _ =>
                baseW.orderBy(unix_timestamp(orderCol))
                  .rangeBetween(-seconds.toLong, Window.currentRow)
            }
          case _ => baseW.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)
        }
      case None =>
        baseW.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }

  private def compileField(f: com.fasterxml.jackson.databind.JsonNode,
      schema: StructType, baseW: WindowSpec, orderCol: Column,
      orderType: Option[DataType]): Column = {
    // `type`/`input` are the processing-steps spellings
    val func = f.str("func").orElse(f.str("op")).orElse(f.str("type"))
      .getOrElse(if (f("expression").isDefined) "expression" else "lag")
    def in: Column = col(f.str("field").orElse(f.str("input"))
      .getOrElse(f.str("name").get))
    val w = frame(f, baseW, orderCol, orderType)
    func match {
      case "lag" => lag(in, f.int("offset").getOrElse(1)).over(baseW)
      case "lead" => lead(in, f.int("offset").getOrElse(1)).over(baseW)
      case "row_number" => row_number().over(baseW)
      case "rank" => rank().over(baseW)
      case "dense_rank" => dense_rank().over(baseW)
      case "percent_rank" => percent_rank().over(baseW)
      case "ntile" => ntile(f.int("n").getOrElse(4)).over(baseW)
      case "cume_dist" => cume_dist().over(baseW)
      case "first" => first(in, ignoreNulls = true).over(w)
      case "last" => last(in, ignoreNulls = true).over(w)
      case "sum" => sum(in).over(w)
      case "avg" | "mean" => avg(in).over(w)
      case "max" => max(in).over(w)
      case "min" => min(in).over(w)
      case "count" => count(in).over(w)
      case "std" => stddev_samp(in).over(w)
      // rolling order statistics (median smoothing / rolling P95
      // latency): exact interpolated percentile over the frame —
      // holistic, so the frame bound is the memory bound
      case "median" =>
        percentile(in.cast(DoubleType), lit(0.5)).over(w)
      case "percentile" =>
        val pct = f.dbl("percentile").orElse(f.dbl("fraction"))
          .getOrElse(0.5)
        percentile(in.cast(DoubleType), lit(pct)).over(w)
      case "expression" =>
        // field[k] → lag(field, k) over the key window (Lag.java)
        val ast = ExprParser.parse(f.str("expression").get)
        val resolve: ExprCompiler.Resolver = (n, idx) => {
          val dt = schema.find(_.name == n).map(_.dataType)
          idx.getOrElse(0) match {
            case 0 => ExprCompiler.toDouble(col(n), dt)
            case k => ExprCompiler.toDouble(lag(col(n), k).over(baseW), dt)
          }
        }
        ExprCompiler.toNullable(ExprCompiler.compile(ast, resolve))
      case "binning" =>
        // processing-transform binning: value → bucket index by bounds
        val bounds = f.arrOf("bins").map(_.asDouble)
        bounds.zipWithIndex.foldRight(lit(bounds.size): Column) {
          case ((b, i), acc) => when(in <= b, i).otherwise(acc)
        }
      case "argmax" =>
        max_by(in, col(f.str("comparingField").getOrElse(
          f.str("field").get))).over(w)
      case "argmin" =>
        min_by(in, col(f.str("comparingField").getOrElse(
          f.str("field").get))).over(w)
      case "simple_regression" | "linear_regression" =>
        // processing learner/LinearRegression.java: rolling per-key
        // OLS over the frame; y = field, x = xField or the order key
        val y = in.cast(DoubleType)
        val x = f.str("xField").map(c => col(c).cast(DoubleType))
          .getOrElse(orderCol.cast(DoubleType))
        val slope = regr_slope(y, x).over(w)
        val icept = regr_intercept(y, x).over(w)
        val sse = greatest(
          regr_syy(y, x).over(w) -
            pow(regr_slope(y, x).over(w), 2) * regr_sxx(y, x).over(w),
          lit(0d))
        struct(slope.as("slope"), icept.as("intercept"),
          sqrt(sse / regr_count(y, x).over(w)).as("rmse"))
      case "linear_filter" =>
        // processing signal/LinearFilter.java FIR form: output =
        // sum_i coefficients(i) * lag(field, i) over the key window
        val coeffs = f.arrOf("coefficients").map(_.asDouble)
        require(coeffs.nonEmpty, "linear_filter requires coefficients")
        coeffs.zipWithIndex.map { case (c, i) =>
          val v = if (i == 0) in else lag(in, i).over(baseW)
          v.cast(DoubleType) * lit(c)
        }.reduce(_ + _)
      case other =>
        throw new IllegalArgumentException(s"unknown window func: $other")
    }
  }
}
