package graft

import org.apache.spark.sql.SparkSession

/** HTTP server mode — the counterpart of the reference's
  * `MPipelineServer` (`MPipelineServer.java:16-40`,
  * `api/PipelineService.java`, `api/SchemaService.java`): a thin
  * servlet layer over the same config lifecycle as [[Run]], sharing
  * one SparkSession across requests.
  *
  * Endpoints:
  *  - `GET  /probe` — liveness, returns `ok` (the reference's probe).
  *  - `POST /schema` — body = YAML/JSON config; builds the DAG
  *    WITHOUT executing sinks and returns every collection's schema
  *    as JSON (the reference's SchemaService).
  *  - `POST /run[?drain=true][&counts=true][&context=c]` — body =
  *    config; executes it (sinks run; `drain` processes all
  *    available streaming data then stops, like Run's --drain).
  *    Returns the built collection names, plus row counts when
  *    `counts=true` (counting forces full computation — opt-in).
  *    Errors return 400 with the exception message.
  *
  * Requests execute SERIALLY (one pipeline at a time on the shared
  * session) — the reference's lifecycle is likewise one pipeline
  * per request; parallel job submission on a shared SparkSession is
  * a scheduler-pool decision a deployment makes, not a default.
  *
  *   spark-submit --class graft.Server pipelinespark.jar [port]
  */
object Server {

  def main(argv: Array[String]): Unit = {
    val port = argv.headOption.map(_.toInt).getOrElse(8080)
    val spark = SparkSession.builder()
      .appName("graft:server")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = start(spark, port)
    System.err.println(
      s"[graft] server listening on port ${srv.getAddress.getPort}")
    // block the main thread; the jdk server's dispatcher is non-daemon
    Thread.currentThread().join()
  }

  /** Start the server (port 0 picks a free port — test surface). */
  def start(spark: SparkSession, port: Int)
      : com.sun.net.httpserver.HttpServer = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(port), 0)
    val lock = new Object

    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        body: String, ctype: String = "application/json"): Unit = {
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", ctype)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    }

    def queryParams(ex: com.sun.net.httpserver.HttpExchange)
        : Map[String, String] =
      Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap

    def handle(ex: com.sun.net.httpserver.HttpExchange)(
        f: => (Int, String)): Unit =
      try {
        val (code, body) = lock.synchronized(f)
        respond(ex, code, body)
      } catch {
        case e: Throwable =>
          respond(ex, 400, graft.config.Json.obj()
            .put("error", s"${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse(""))
            .toString)
      }

    srv.createContext("/probe",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        respond(ex, 200, "ok", "text/plain"))

    srv.createContext("/schema",
      (ex: com.sun.net.httpserver.HttpExchange) => handle(ex) {
        val cfg = new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val built = Pipeline.build(spark, cfg,
          queryParams(ex).collect {
            case (k, v) if k.startsWith("args.") =>
              k.stripPrefix("args.") -> v
          })
        val o = graft.config.Json.obj()
        built.toSeq.sortBy(_._1).foreach { case (n, df) =>
          o.set[com.fasterxml.jackson.databind.JsonNode](n,
            graft.config.Json.parse(df.schema.json))
        }
        (200, o.toString)
      })

    srv.createContext("/run",
      (ex: com.sun.net.httpserver.HttpExchange) => handle(ex) {
        val q = queryParams(ex)
        val cfg = new String(ex.getRequestBody.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val args = q.collect {
          case (k, v) if k.startsWith("args.") =>
            k.stripPrefix("args.") -> v
        }
        val built = Pipeline.execute(spark, cfg, args, q.get("context"))
        if (q.get("drain").contains("true"))
          graft.streaming.StreamRunner.drainAll()
        val o = graft.config.Json.obj()
        val names = o.putArray("collections")
        built.keys.toSeq.sorted.foreach(names.add)
        if (q.get("counts").contains("true")) {
          val counts = o.putObject("counts")
          built.toSeq.sortBy(_._1).foreach { case (n, df) =>
            if (!df.isStreaming) counts.put(n, df.count())
          }
        }
        (200, o.toString)
      })

    srv.start()
    srv
  }
}
