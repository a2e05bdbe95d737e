package graft

import graft.config.Json._
import org.scalatest.funsuite.AnyFunSuite

/** Server mode (SURVEY §3.3 — the reference's MPipelineServer):
  * probe, schema service, pipeline launch over loopback HTTP. */
class ServerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val srv = {
    val s = Server.start(spark, 0)
    sys.addShutdownHook(s.stop(0))
    s
  }
  private def base = s"http://127.0.0.1:${srv.getAddress.getPort}"

  private def http(method: String, path: String, body: String = "")
      : (Int, String) = {
    val client = java.net.http.HttpClient.newHttpClient()
    val b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(base + path))
    val req = (if (method == "GET") b.GET()
      else b.POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(body))).build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private val cfg = """
sources:
  - name: n
    module: storage
    parameters: {path: "/root/testdata/sf0.001/nation.parquet"}
transforms:
  - name: agg
    module: aggregation
    inputs: [n]
    parameters:
      groupFields: [n_regionkey]
      aggregations:
        - input: n
          fields:
            - {name: cnt, op: count}
"""

  test("probe answers ok") {
    assert(http("GET", "/probe") == ((200, "ok")))
  }

  test("schema service returns every collection's schema without " +
      "executing sinks") {
    val (code, body) = http("POST", "/schema", cfg)
    assert(code == 200, body)
    val j = graft.config.Json.parse(body)
    assert(j("n").isDefined && j("agg").isDefined)
    val aggFields = j("agg").get("fields").get.elems
      .map(_.str("name").get).toSet
    assert(aggFields == Set("n_regionkey", "cnt"))
  }

  test("run executes a pipeline and reports counts on demand") {
    val (code, body) = http("POST", "/run?counts=true", cfg)
    assert(code == 200, body)
    val j = graft.config.Json.parse(body)
    assert(j("collections").get.elems.map(_.asText).toSet ==
      Set("n", "agg"))
    assert(j("counts").get.long("n").contains(25L))
    assert(j("counts").get.long("agg").contains(5L))
  }

  test("a broken config returns 400 with the error, not a hang") {
    val (code, body) = http("POST", "/run", "sources:\n  - name: x\n" +
      "    module: nosuch\n    parameters: {}\n")
    assert(code == 400, body)
    assert(body.contains("error"))
  }
}
