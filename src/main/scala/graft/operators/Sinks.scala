package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.ops.TemplateCompiler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Sink builders register the input collection under the sink's name
  * (so `waits` can reference it); actual writes happen in
  * SinkExecutor at execute() time, keeping build() side-effect free. */
object SinkExecutor {
  def execute(spark: SparkSession, cfg: ModuleCfg,
      input: Option[DataFrame]): Unit =
    if (input.exists(_.isStreaming))
      graft.streaming.StreamRunner.start(cfg, input.get)
    else cfg.module match {
      case "storage" | "files" => StorageSink.write(cfg, input.get)
      case "jdbc" => JdbcSink.write(cfg, input.get)
      case "text" => TextSink.write(cfg, input.get)
      case "debug" => input.foreach(_.show(
        cfg.params.int("limit").getOrElse(20), truncate = false))
      case _ =>
    }
}

/** `storage` sink (reference `module/sink/StorageSink.java`): write
  * csv/json/avro/parquet; `numShards` → repartition; field-based
  * dynamic destinations → `partitionBy` (the scalable equivalent of
  * the reference's per-record path templates `StorageSink.java:222-303`). */
object StorageSink {
  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] =
    Map(cfg.name -> TransformCommon.single(cfg, inputs))

  def write(cfg: ModuleCfg, df0: DataFrame): Unit = {
    val p = cfg.params
    val path = p.str("output").orElse(p.str("path")).getOrElse(
      throw new IllegalArgumentException("storage sink requires output"))
    val format = p.str("format").getOrElse("parquet")
    var df = df0
    p.int("numShards").filter(_ > 0).foreach(n => df = df.repartition(n))
    var writer = df.write.format(format).mode(
      p.str("mode").getOrElse("overwrite"))
    val partitionFields = p.strArr("partitionFields") ++
      p.strArr("dynamicSplitFields")
    if (partitionFields.nonEmpty)
      writer = writer.partitionBy(partitionFields: _*)
    if (format == "csv")
      writer = writer.option("header",
        p.bool("header").getOrElse(true).toString)
    p.str("compression").foreach(c => writer = writer.option("compression", c))
    writer.save(path)
  }
}

/** `text` sink (reference `module/sink/TextSink.java` — FreeMarker
  * template per record): template compiles to a `concat` Column, one
  * line per record, written as text. */
object TextSink {
  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] =
    Map(cfg.name -> TransformCommon.single(cfg, inputs))

  def write(cfg: ModuleCfg, df: DataFrame): Unit = {
    val template = cfg.params.str("template").getOrElse("${" +
      df.columns.head + "}")
    val line = TemplateCompiler.compile(template, df.schema)
    df.select(line.cast(StringType).as("value"))
      .write.mode("overwrite")
      .text(cfg.params.str("output").orElse(cfg.params.str("path")).get)
  }
}

object DebugSink {
  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] =
    Map(cfg.name -> TransformCommon.single(cfg, inputs))
}

/** `jdbc` sink (reference `module/sink/JdbcSink.java`): append/
  * overwrite via Spark's built-in JDBC writer; upsert ops would need
  * foreachBatch MERGE (documented slot). */
object JdbcSink {
  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] =
    Map(cfg.name -> TransformCommon.single(cfg, inputs))

  def write(cfg: ModuleCfg, df: DataFrame): Unit = {
    val p = cfg.params
    var w = df.write.format("jdbc")
      .option("url", p.str("url").getOrElse(
        throw new IllegalArgumentException("jdbc sink requires url")))
      .option("dbtable", p.str("table").getOrElse(
        throw new IllegalArgumentException("jdbc sink requires table")))
      .mode(p.str("mode").getOrElse("append"))
    p.str("driver").foreach(d => w = w.option("driver", d))
    p.str("user").foreach(u => w = w.option("user", u))
    p.str("password").foreach(x => w = w.option("password", x))
    p.int("batchSize").foreach(b => w = w.option("batchsize", b.toString))
    w.save()
  }
}
