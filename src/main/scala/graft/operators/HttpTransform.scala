package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.ops.{HttpFunctions, TemplateCompiler}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `http` transform module (reference `transform/HttpTransform.java`
  * + `util/domain/web/HttpUtil.java:26-330`): per-row HTTP enrichment
  * with templated endpoint/params/headers/body, response formats
  * text|bytes|json, acceptable status codes, retry with exponential
  * backoff, and failure routing.
  *
  * Spark-first split: everything EXCEPT the socket I/O compiles to
  * Catalyst columns — endpoint/header/body templates render via
  * codegen'd `concat` (TemplateCompiler), query params url-encode via
  * the built-in `url_encode`, and json response bodies parse with
  * `from_json` AFTER the call. Only the send itself is a UDF
  * (per-executor client singleton, retry/backoff + rate gate inside).
  *
  * Output matches `HttpUtil.createResponseSchema:237-256`: statusCode
  * int, body (string | binary | parsed struct), headers
  * map<string,array<string>>, timestamp — the input row is replaced by
  * the response record, then optional `select`/`filter`/`flattenField`
  * post-process it, exactly like the reference's Select stage.
  *
  * Failed calls (non-acceptable 4xx, exhausted retries) route to
  * `<name>.failures` carrying the input row plus `__error`
  * (module/MErrorHandler routing); `failFast: true` raises instead.
  * Caveat: consuming BOTH the main and failures outputs re-executes
  * the calls (two Spark actions over a nondeterministic stage) —
  * persist the upstream if you need both.
  *
  * Engine extension: `rateLimitPerSecond` spaces requests per executor
  * JVM (aggregate rate = perSecond x executors).
  */
object HttpTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val df = TransformCommon.single(cfg, inputs)
    val req = cfg.param("request").getOrElse {
      val reqs = cfg.param("requests").map(_.elems).getOrElse(Seq.empty)
      if (reqs.size > 1) throw new IllegalArgumentException(
        "http transform supports one request per module (the reference " +
          "caller also sends only `request`); use multiple http modules " +
          "or the http source for request fan-out")
      reqs.headOption.getOrElse(throw new IllegalArgumentException(
        "http transform requires parameters.request"))
    }
    val resp = cfg.param("response").getOrElse(graft.config.Json.obj())
    val format = resp.str("format").getOrElse("text")
    require(Set("text", "bytes", "json").contains(format),
      s"http response.format must be text|bytes|json, got: $format")
    val acceptable = resp.arrOf("acceptableStatusCodes").map(_.asInt).toSet
    val bodySchema = resp("schema").map(graft.schema.SchemaMapper.toStructType)

    val method = req.str("method").getOrElse("GET")
    val endpoint = req.str("endpoint").getOrElse(
      throw new IllegalArgumentException("http request.endpoint required"))
    val timeoutMillis =
      cfg.params.int("timeoutSecond").getOrElse(30) * 1000

    // endpoint + url-encoded query params, all codegen'd
    // (HttpUtil.createEndpoint:316-329)
    val schema = df.schema
    val urlCol: Column = {
      val base = TemplateCompiler.compile(endpoint, schema)
      val ps = req("params").map(p => p.names.map(k =>
        (k, TemplateCompiler.compile(p.str(k).get, schema)))).getOrElse(Seq.empty)
      if (ps.isEmpty) base
      else concat(base, lit("?"), concat_ws("&", ps.map { case (k, v) =>
        concat(lit(k + "="), url_encode(v)) }: _*))
    }
    val headersCol: Column = req("headers") match {
      case Some(h) if h.names.nonEmpty =>
        map(h.names.flatMap(k => Seq(lit(k),
          TemplateCompiler.compile(h.str(k).get, schema))): _*)
      case _ => map()
    }
    val bodyCol: Column = req("body") match {
      case Some(b) if b.isTextual => TemplateCompiler.compile(b.asText, schema)
      case Some(b) => TemplateCompiler.compile(b.toString, schema)
      case None => lit("")
    }

    val backoffNode = cfg.param("retry").flatMap(_.apply("backoff"))
    val backoff = HttpFunctions.Backoff(
      exponent = backoffNode.flatMap(_.dbl("exponent")).getOrElse(1.5),
      initialBackoffSecond =
        backoffNode.flatMap(_.int("initialBackoffSecond")).getOrElse(1),
      maxBackoffSecond =
        backoffNode.flatMap(_.int("maxBackoffSecond")).getOrElse(86400000),
      maxCumulativeBackoffSecond = backoffNode
        .flatMap(_.int("maxCumulativeBackoffSecond")).getOrElse(86400000),
      maxRetries =
        backoffNode.flatMap(_.int("maxRetries")).getOrElse(Int.MaxValue))
    val ratePerSecond =
      cfg.params.dbl("rateLimitPerSecond").getOrElse(0d)

    val client = HttpFunctions.client // capture at plan time
    val rateKey = cfg.name
    val mth = method
    val acc = acceptable
    val tmo = timeoutMillis
    val bo = backoff
    val rps = ratePerSecond
    val callUdf = udf { (url: String, headers: Map[String, String],
        body: String) =>
      HttpFunctions.callWithRetry(client, rateKey, rps, mth, url,
        if (headers == null) Map.empty[String, String] else headers,
        body, tmo, acc, bo)
    }.asNondeterministic()

    val called = df.withColumn("__http",
      callUdf(urlCol, headersCol, bodyCol))

    val bodyOut: Column = format match {
      case "bytes" => col("__http.body")
      case "text" => decode(col("__http.body"), "UTF-8")
      case "json" =>
        val text = decode(col("__http.body"), "UTF-8")
        bodySchema.map(st => from_json(text, st)).getOrElse(text)
    }
    val ok = called.filter(col("__http.error").isNull)
    val main0 = ok.select(
      col("__http.statusCode").cast(IntegerType).as("statusCode"),
      bodyOut.as("body"),
      col("__http.headers").as("headers"),
      timestamp_micros(col("__http.timestampMicros")).as("timestamp"))
    val failures = called.filter(col("__http.error").isNotNull)
      .withColumn("__error", col("__http.error")).drop("__http")
    val main =
      if (cfg.node.bool("failFast").getOrElse(false))
        called.select(
          when(col("__http.error").isNotNull,
            raise_error(col("__http.error")))
            .otherwise(col("__http.statusCode").cast(IntegerType))
            .as("statusCode"),
          bodyOut.as("body"),
          col("__http.headers").as("headers"),
          timestamp_micros(col("__http.timestampMicros")).as("timestamp"))
      else main0
    Map(cfg.name -> TransformCommon.finish(main, cfg),
      s"${cfg.name}.failures" -> failures)
  }
}
