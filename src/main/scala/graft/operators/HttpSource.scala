package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.ops.HttpFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `http` source (reference `source/HttpSource.java` — request list +
  * response format + optional poll rate).
  *
  *  - `rate == 0` (default): one-shot batch — one output row per
  *    configured request.
  *  - `rate > 0`: polling stream — a Spark rate source ticks once per
  *    `rate` (x rateUnit) and each tick fans out to every request, so
  *    the stream re-fetches per interval (the reference's
  *    GenerateSequence + fetch pattern).
  *
  * Endpoints in a SOURCE have no input row to template against, so
  * request fields are taken literally. Output schema matches the http
  * transform / HttpUtil.createResponseSchema: statusCode, body
  * (text | binary | parsed struct), headers, timestamp.
  */
object HttpSource {

  private case class Req(endpoint: String, method: String,
      headers: Map[String, String], body: String)

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val p = cfg.params
    val reqNodes = p.arrOf("requests") ++ p("request").toSeq
    require(reqNodes.nonEmpty, "http source requires request(s)")
    val reqs = reqNodes.map { r =>
      Req(
        r.str("endpoint").getOrElse(throw new IllegalArgumentException(
          "http source request.endpoint required")),
        r.str("method").getOrElse("GET"),
        r("headers").map(h => h.names.map(k => k -> h.str(k).get).toMap)
          .getOrElse(Map.empty),
        r.str("body").getOrElse(""))
    }
    val resp = p("response").getOrElse(graft.config.Json.obj())
    val format = resp.str("format").getOrElse("text")
    val acceptable = resp.arrOf("acceptableStatusCodes").map(_.asInt).toSet
    val bodySchema = resp("schema").map(graft.schema.SchemaMapper.toStructType)
    val timeoutMillis = p.int("timeoutSecond").getOrElse(60) * 1000
    val rateSeconds = {
      val unit = p.str("rateUnit").getOrElse("second") match {
        case "second" => 1L
        case "minute" => 60L
        case "hour" => 3600L
        case other =>
          throw new IllegalArgumentException(s"rateUnit: $other")
      }
      p.long("rate").getOrElse(0L) * unit
    }

    val client = HttpFunctions.client
    val acc = acceptable
    val tmo = timeoutMillis
    val rateKey = cfg.name
    val callUdf = udf { (endpoint: String, method: String,
        headers: Map[String, String], body: String) =>
      HttpFunctions.callWithRetry(client, rateKey, 0d, method, endpoint,
        if (headers == null) Map.empty[String, String] else headers,
        body, tmo, acc, HttpFunctions.Backoff(maxRetries = 3))
    }.asNondeterministic()

    // request rows as struct LITERALS, not a case-class Dataset: the
    // nested-case-class encoder trips a Janino accessor bug and falls
    // back to interpreted projection (cold path, but the WARN+stack
    // is noise and the literal form stays inside codegen)
    val reqLits: Column = array(reqs.map(r => struct(
      lit(r.endpoint).as("endpoint"), lit(r.method).as("method"),
      (if (r.headers.isEmpty) map().cast("map<string,string>")
       else map(r.headers.flatMap { case (k, v) =>
         Seq(lit(k), lit(v)) }.toSeq: _*)).as("headers"),
      lit(r.body).as("body"))): _*)
    val requestRows: DataFrame =
      if (rateSeconds <= 0)
        spark.range(1).select(explode(reqLits).as("__r"))
          .select(col("__r.*"))
      else {
        // 1 tick per rateSeconds: rate source at 1 row/s, keep every
        // rateSeconds-th value (rate source has no sub-1/s setting)
        val ticks = spark.readStream.format("rate")
          .option("rowsPerSecond", "1").load()
          .filter(col("value") % rateSeconds === 0)
        ticks.select(explode(reqLits).as("__r"))
          .select(col("__r.*"))
      }

    // Both <name> and <name>.failures derive from this one
    // nondeterministic call column. Persist the batch frame so a
    // pipeline consuming both outputs (two Spark actions) doesn't
    // re-fire every request — and so a row can't flip between
    // main/failures across executions. Lazy: materialized on the
    // first action, reused by the second. Streaming polls can't
    // persist; there, consuming both outputs means two independent
    // streaming queries each issuing the requests (documented caveat,
    // same as the http transform).
    val calledRaw = requestRows.withColumn("__http",
      callUdf(col("endpoint"), col("method"), col("headers"), col("body")))
    val called =
      if (calledRaw.isStreaming) calledRaw
      else graft.ops.CacheTracker.trackPersist(calledRaw)
    val bodyOut: Column = format match {
      case "bytes" => col("__http.body")
      case "json" =>
        val text = decode(col("__http.body"), "UTF-8")
        bodySchema.map(st => from_json(text, st)).getOrElse(text)
      case _ => decode(col("__http.body"), "UTF-8")
    }
    val out = called.filter(col("__http.error").isNull).select(
      col("__http.statusCode").cast(IntegerType).as("statusCode"),
      bodyOut.as("body"),
      col("__http.headers").as("headers"),
      timestamp_micros(col("__http.timestampMicros")).as("timestamp"))
    // failed requests (exhausted retries, non-acceptable 4xx) route to
    // <name>.failures with the request row + __error, like the
    // transform — not silently emitted as all-null rows
    val failures = called.filter(col("__http.error").isNotNull)
      .withColumn("__error", col("__http.error")).drop("__http")
    SourceCommon.finish(out, cfg) +
      (s"${cfg.name}.failures" -> failures)
  }
}
