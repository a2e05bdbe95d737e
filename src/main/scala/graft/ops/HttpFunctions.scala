package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Per-row HTTP enrichment (reference `util/pipeline/select/Http.java`,
  * `transform/HttpTransform.java`, `util/domain/web/HttpUtil.java`).
  * Genuinely imperative I/O → a UDF whose client is a per-executor lazy
  * singleton (connection reuse; the mapPartitions-style amortization
  * without losing Column composability).
  *
  * Side-effecting: not idempotent under speculative re-execution —
  * disable speculation for pipelines using it (documented, as the
  * reference does for its retry semantics).
  *
  * `Client` is pluggable so tests (and zero-egress environments)
  * inject a stub; the default uses java.net.http.
  */
object HttpFunctions {

  /** Raw response triple (HttpUtil.createResponseSchema fields minus
    * the derived timestamp). */
  case class Resp(status: Int, body: Array[Byte],
      headers: Map[String, Seq[String]])

  trait Client extends Serializable {
    def get(url: String, timeoutMillis: Int): String

    /** Full request surface (HttpUtil.sendRequest:258-289): method +
      * templated headers/body. Default delegates to `get` so simple
      * stubs keep working. */
    def send(method: String, url: String, headers: Map[String, String],
        body: String, timeoutMillis: Int): Resp =
      Resp(200, get(url, timeoutMillis).getBytes("UTF-8"), Map.empty)
  }

  object DefaultClient extends Client {
    @transient private lazy val client =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    def get(url: String, timeoutMillis: Int): String =
      new String(send("GET", url, Map.empty, "", timeoutMillis).body, "UTF-8")
    override def send(method: String, url: String,
        headers: Map[String, String], body: String,
        timeoutMillis: Int): Resp = {
      var b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMillis.toLong))
        .method(method.toUpperCase(java.util.Locale.ROOT),
          java.net.http.HttpRequest.BodyPublishers.ofString(
            if (body == null) "" else body))
      headers.foreach { case (k, v) => b = b.header(k, v) }
      val r = client.send(b.build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      import scala.jdk.CollectionConverters._
      Resp(r.statusCode(), r.body(),
        r.headers().map().asScala.map { case (k, v) =>
          k -> v.asScala.toSeq }.toMap)
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
      catch {
        // never swallow task-kill interrupts (same invariant as
        // callWithRetry below)
        case e: InterruptedException => throw e
        case e: Exception => s"__error:${e.getMessage}"
      }
    }.asNondeterministic()
    f(url)
  }

  /** Per-JVM request spacing: a minimum-interval gate per module name.
    * On a cluster this bounds the rate PER EXECUTOR — the aggregate
    * rate is `perSecond * executors` (engine extension; the reference
    * relies on runner-level throttling). */
  object RateLimiter {
    private val next = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicLong]()
    def acquire(key: String, perSecond: Double): Unit = {
      if (perSecond <= 0) return
      val interval = (1e9 / perSecond).toLong
      val slot = next.computeIfAbsent(key,
        _ => new java.util.concurrent.atomic.AtomicLong(0L))
      var waitNanos = 0L
      var claimed = false
      while (!claimed) {
        val now = System.nanoTime()
        val prev = slot.get()
        val mine = math.max(prev + interval, now)
        if (slot.compareAndSet(prev, mine)) {
          waitNanos = mine - now
          claimed = true
        }
      }
      if (waitNanos > 0)
        Thread.sleep(waitNanos / 1000000L, (waitNanos % 1000000L).toInt)
    }
  }

  /** Backoff policy (HttpTransform BackoffParameters defaults:
    * exponent 1.5, initial 1s, effectively-unbounded retries capped by
    * cumulative backoff). */
  case class Backoff(exponent: Double = 1.5, initialBackoffSecond: Int = 1,
      maxBackoffSecond: Int = 86400000, maxCumulativeBackoffSecond: Int = 86400000,
      maxRetries: Int = Int.MaxValue)

  /** UDF result row: raw bytes + status + headers + error. A null
    * `error` means the call completed acceptably. */
  case class CallResult(statusCode: Option[Int], body: Array[Byte],
      headers: Map[String, Seq[String]], timestampMicros: Long,
      error: Option[String])

  /** One request with retry/backoff/rate-limit (the Spark counterpart
    * of RequestResponseIO + HttpCaller.call, HttpTransform.java:505-585):
    * remote/IO errors retry with exponential backoff; a non-acceptable
    * 4xx is a terminal user error (no retry), matching the reference's
    * UserCodeExecutionException vs UserCodeRemoteSystemException split. */
  def callWithRetry(c: Client, rateKey: String, ratePerSecond: Double,
      method: String, url: String, headers: Map[String, String],
      body: String, timeoutMillis: Int, acceptable: Set[Int],
      backoff: Backoff): CallResult = {
    var attempt = 0
    var cumulativeMs = 0L
    var backoffMs = backoff.initialBackoffSecond * 1000L
    val maxCumulativeMs = backoff.maxCumulativeBackoffSecond * 1000L
    while (true) {
      try {
        RateLimiter.acquire(rateKey, ratePerSecond)
        val r = c.send(method, url, headers, body, timeoutMillis)
        val nowMicros = System.currentTimeMillis() * 1000L
        if (r.status >= 400 && r.status < 500 && !acceptable.contains(r.status))
          return CallResult(Some(r.status), r.body, r.headers, nowMicros,
            Some(s"Illegal response code: ${r.status} for endpoint: $url"))
        // NOTE: 5xx responses emit as normal output rows — the
        // reference only rejects non-acceptable 4xx
        // (HttpTransform.java HttpCaller.call)
        return CallResult(Some(r.status), r.body, r.headers, nowMicros, None)
      } catch {
        case e: InterruptedException =>
          // Spark task kill — never swallow
          Thread.currentThread().interrupt()
          throw e
        case e @ (_: IllegalArgumentException |
            _: java.net.URISyntaxException) =>
          // malformed URL etc: terminal user error, no retry
          // (the reference's UserCodeExecutionException split)
          return CallResult(None, null, null,
            System.currentTimeMillis() * 1000L,
            Some(s"Illegal request for endpoint $url: ${e.getMessage}"))
        case e: Exception =>
          attempt += 1
          if (attempt > backoff.maxRetries ||
            cumulativeMs + backoffMs > maxCumulativeMs)
            return CallResult(None, null, null,
              System.currentTimeMillis() * 1000L,
              Some(s"Remote error for endpoint $url: ${e.getMessage}"))
          Thread.sleep(backoffMs)
          cumulativeMs += backoffMs
          backoffMs = math.min(
            (backoffMs * backoff.exponent).toLong,
            backoff.maxBackoffSecond * 1000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
