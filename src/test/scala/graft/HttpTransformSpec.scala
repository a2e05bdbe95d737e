package graft

import graft.ops.HttpFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Call counter in a standalone object: client classes reference it
  * statically (MODULE$), so task-closure serialization never copies
  * the counter and assertions see every executor-side call (local
  * mode = same JVM). */
object HttpCallCounter {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Echoes method/url/header/body so templates are assertable. */
class RecordingHttpClient extends HttpFunctions.Client {
  def get(url: String, timeoutMillis: Int): String = {
    HttpCallCounter.calls.incrementAndGet(); s"echo:$url"
  }
  override def send(method: String, url: String,
      headers: Map[String, String], body: String,
      timeoutMillis: Int): HttpFunctions.Resp = {
    HttpCallCounter.calls.incrementAndGet()
    HttpFunctions.Resp(200,
      s"$method:$url:h=${headers.getOrElse("X-Auth", "")}:b=$body"
        .getBytes("UTF-8"),
      Map("content-type" -> Seq("text/plain")))
  }
}

/** Fails with IOException until call number `failUntil`, then 200. */
class FlakyHttpClient(failUntil: Int) extends HttpFunctions.Client {
  def get(url: String, timeoutMillis: Int): String =
    throw new UnsupportedOperationException
  override def send(method: String, url: String,
      headers: Map[String, String], body: String,
      timeoutMillis: Int): HttpFunctions.Resp = {
    val n = HttpCallCounter.calls.incrementAndGet()
    if (n < failUntil) throw new java.io.IOException(s"flaky $n")
    HttpFunctions.Resp(200, s"ok after $n".getBytes("UTF-8"), Map.empty)
  }
}

/** Always returns the given status with a small JSON body. */
class StatusHttpClient(status: Int) extends HttpFunctions.Client {
  def get(url: String, timeoutMillis: Int): String =
    throw new UnsupportedOperationException
  override def send(method: String, url: String,
      headers: Map[String, String], body: String,
      timeoutMillis: Int): HttpFunctions.Resp = {
    HttpCallCounter.calls.incrementAndGet()
    HttpFunctions.Resp(status, s"""{"msg":"s$status"}""".getBytes("UTF-8"),
      Map.empty)
  }
}

/** `http` transform module: templated requests, retry/backoff,
  * acceptable status codes, json body parsing, failure routing.
  * All via injected stub clients (zero-egress environment). */
class HttpTransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withClient[A](c: HttpFunctions.Client)(f: => A): A = {
    val prev = HttpFunctions.client
    HttpFunctions.client = c
    HttpCallCounter.calls.set(0)
    try f finally HttpFunctions.client = prev
  }

  private def httpModule(params: String,
      rows: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("http")(spark,
      Pipeline.ModuleCfg("e", "http", Seq("rows"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("rows" -> rows))

  test("http: templated endpoint/params/headers/body render per row") {
    withClient(new RecordingHttpClient) {
      val rows = Seq((7, "a b"), (8, "c")).toDF("id", "name")
      val dfs = httpModule("""
        {"request": {"endpoint": "http://svc/api/${id}",
          "method": "POST",
          "params": {"q": "${name}", "lang": "en"},
          "headers": {"X-Auth": "k-${id}"},
          "body": "payload ${name}"},
         "response": {"format": "text"}}""", rows)
      val out = dfs("e").orderBy($"body").collect()
      assert(out.length == 2)
      val b0 = out.map(_.getAs[String]("body")).sorted.head
      // url_encode is form-encoding: space → '+'
      assert(b0 ==
        "POST:http://svc/api/7?q=a+b&lang=en:h=k-7:b=payload a b")
      assert(out.forall(_.getAs[Int]("statusCode") == 200))
      assert(dfs("e").schema.fieldNames.toSeq ==
        Seq("statusCode", "body", "headers", "timestamp"))
    }
  }

  test("http: remote errors retry with backoff until success") {
    withClient(new FlakyHttpClient(failUntil = 3)) {
      val rows = Seq((1, "x")).toDF("id", "name")
      val dfs = httpModule("""
        {"request": {"endpoint": "http://svc/${id}"},
         "response": {"format": "text"},
         "retry": {"backoff": {"initialBackoffSecond": 0,
           "maxRetries": 5}}}""", rows)
      val out = dfs("e").collect()
      assert(out.length == 1)
      assert(out.head.getAs[String]("body") == "ok after 3")
      assert(HttpCallCounter.calls.get() == 3)
    }
  }

  test("http: retries exhausted routes row to failures with __error") {
    withClient(new FlakyHttpClient(failUntil = 100)) {
      val rows = Seq((1, "x")).toDF("id", "name")
      val dfs = httpModule("""
        {"request": {"endpoint": "http://svc/${id}"},
         "response": {"format": "text"},
         "retry": {"backoff": {"initialBackoffSecond": 0,
           "maxRetries": 2}}}""", rows)
      val fails = dfs("e.failures").collect()
      assert(fails.length == 1)
      assert(fails.head.getAs[String]("__error").contains("Remote error"))
      assert(fails.head.getAs[Int]("id") == 1) // input row preserved
    }
  }

  test("http: non-acceptable 4xx is terminal (no retry), acceptable passes") {
    withClient(new StatusHttpClient(404)) {
      val rows = Seq((1, "x")).toDF("id", "name")
      val rejected = httpModule("""
        {"request": {"endpoint": "http://svc/${id}"},
         "response": {"format": "text"},
         "retry": {"backoff": {"initialBackoffSecond": 0,
           "maxRetries": 5}}}""", rows)
      assert(rejected("e.failures").count() == 1)
      assert(HttpCallCounter.calls.get() == 1) // user error: not retried
      HttpCallCounter.calls.set(0)
      val accepted = httpModule("""
        {"request": {"endpoint": "http://svc/${id}"},
         "response": {"format": "text",
           "acceptableStatusCodes": [404]}}""", rows)
      val out = accepted("e").collect()
      assert(out.length == 1 && out.head.getAs[Int]("statusCode") == 404)
    }
  }

  test("http: json format parses body into declared schema") {
    withClient(new StatusHttpClient(200)) {
      val rows = Seq((1, "x")).toDF("id", "name")
      val dfs = httpModule("""
        {"request": {"endpoint": "http://svc/${id}"},
         "response": {"format": "json",
           "schema": {"fields": [{"name": "msg", "type": "string"}]}}}""",
        rows)
      val out = dfs("e").select($"body.msg").as[String].collect()
      assert(out.sameElements(Array("s200")))
    }
  }

  test("http select func: POST with templated headers and body") {
    withClient(new RecordingHttpClient) {
      val rows = Seq((5, "n5")).toDF("id", "name")
      val out = graft.ops.SelectCompiler(rows, graft.config.Json.parse("""
        [{"name": "id"},
         {"name": "resp", "func": "http", "url": "http://svc/${id}",
          "method": "POST", "headers": {"X-Auth": "t-${id}"},
          "body": "b-${name}"}]""")).collect()
      assert(out.head.getAs[String]("resp") ==
        "POST:http://svc/5:h=t-5:b=b-n5")
    }
  }

  test("http source: one-shot batch emits one row per request") {
    withClient(new RecordingHttpClient) {
      val dfs = Pipeline.sources("http")(spark,
        Pipeline.ModuleCfg("src", "http", Nil, Nil,
          graft.config.Json.parse("""
            {"requests": [
               {"endpoint": "http://svc/a"},
               {"endpoint": "http://svc/b", "method": "POST",
                "body": "ping"}],
             "response": {"format": "text"}}"""),
          graft.config.Json.obj()), Map.empty)
      val out = dfs("src").orderBy("body").collect()
      assert(out.length == 2)
      val bodies = out.map(_.getAs[String]("body")).sorted
      assert(bodies(0) == "GET:http://svc/a:h=:b=")
      assert(bodies(1) == "POST:http://svc/b:h=:b=ping")
      assert(out.forall(_.getAs[Int]("statusCode") == 200))
    }
  }

  test("http source: rate > 0 builds a polling stream") {
    withClient(new RecordingHttpClient) {
      val dfs = Pipeline.sources("http")(spark,
        Pipeline.ModuleCfg("src", "http", Nil, Nil,
          graft.config.Json.parse("""
            {"requests": [{"endpoint": "http://svc/poll"}],
             "rate": 5, "response": {"format": "text"}}"""),
          graft.config.Json.obj()), Map.empty)
      assert(dfs("src").isStreaming)
      assert(dfs("src").schema.fieldNames.toSeq ==
        Seq("statusCode", "body", "headers", "timestamp"))
    }
  }

  test("http: rate limit spaces per-executor calls") {
    withClient(new RecordingHttpClient) {
      val rows = (1 to 6).map(i => (i, s"n$i")).toDF("id", "name")
        .repartition(1)
      val dfs = httpModule("""
        {"request": {"endpoint": "http://svc/${id}"},
         "response": {"format": "text"},
         "rateLimitPerSecond": 50}""", rows)
      val t0 = System.nanoTime()
      assert(dfs("e").count() == 6)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      // 6 calls at 50/s → ≥ 100ms of spacing after the first
      assert(elapsedMs >= 95, s"rate gate too fast: $elapsedMs ms")
    }
  }
}
