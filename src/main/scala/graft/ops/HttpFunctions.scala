package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Per-row HTTP enrichment (reference `util/pipeline/select/Http.java`
  * and `transform/HttpTransform.java`). Genuinely imperative I/O → a
  * UDF whose client is a per-executor lazy singleton (connection
  * reuse; the mapPartitions-style amortization without losing Column
  * composability).
  *
  * Side-effecting: not idempotent under speculative re-execution —
  * disable speculation for pipelines using it (documented, as the
  * reference does for its retry semantics).
  *
  * `Client` is pluggable so tests (and zero-egress environments)
  * inject a stub; the default uses java.net.http.
  */
object HttpFunctions {

  trait Client extends Serializable {
    def get(url: String, timeoutMillis: Int): String
  }

  object DefaultClient extends Client {
    @transient private lazy val client =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    def get(url: String, timeoutMillis: Int): String = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMillis.toLong)).GET()
        .build()
      client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    }
  }

  /** Test/offline stub: echoes the url. */
  object EchoClient extends Client {
    def get(url: String, timeoutMillis: Int): String = s"echo:$url"
  }

  @volatile var client: Client = DefaultClient

  def httpGet(url: Column, timeoutMillis: Int = 10000): Column = {
    val c = client // capture at plan time
    val f = udf { (u: String) =>
      if (u == null) null
      else try c.get(u, timeoutMillis)
      catch { case e: Exception => s"__error:${e.getMessage}" }
    }.asNondeterministic()
    f(url)
  }
}
