package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.util.concurrent.{CompletionStage, ConcurrentHashMap, Executors, TimeUnit}
import scala.collection.mutable

/** Micro-batch WebSocket source (reference
  * `module/source/WebSocketSource.java`): subscribes to `endpoint`
  * with `java.net.http.WebSocket`, buffers received frames on the
  * driver, and serves them to micro-batches through the DataSource V2
  * `MicroBatchStream` contract — the same driver-buffered shape as
  * Spark's own socket source, which is the honest Structured
  * Streaming mapping of a push socket (frames are not replayable, so
  * delivery is at-most-once across driver restarts; the reference's
  * Beam DoFn loop has the same property).
  *
  * Options (mirroring the reference parameters):
  *  - `endpoint` (required) — ws:// or wss:// URI
  *  - `requests` — JSON array/object/string; each entry is sent as a
  *    text message once the socket opens (subscription messages),
  *    `requestIntervalSeconds` apart
  *  - `heartbeatRequests` + `heartbeatIntervalSeconds` — messages
  *    re-sent on a timer to keep the subscription alive
  *
  * Output schema: `payload binary` (UTF-8 bytes for text frames),
  * `timestamp` (receive time). Payload decoding (json/avro/protobuf)
  * composes with the existing deserialize surface in the builder.
  * Reconnects with 1 s backoff until `stop()`. */
object WebSocketStream {
  val SCHEMA: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("timestamp", TimestampType)))

  /** requests/heartbeatRequests accept a JSON array (objects or
    * strings), one object, or one string (WebSocketSource.java
    * constructor normalization). */
  def parseRequests(raw: String): Seq[String] = {
    val t = raw.trim
    if (t.isEmpty) Nil
    else {
      val n = graft.config.Json.parse(t)
      import graft.config.Json._
      if (n.isArray)
        n.elems.map(e => if (e.isTextual) e.asText else e.toString)
      else if (n.isTextual) Seq(n.asText)
      else Seq(n.toString)
    }
  }
}

class WebSocketTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WebSocketStream.SCHEMA
  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WebSocketTable(properties)
}

class WebSocketTable(properties: java.util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"websocket(${properties.get("endpoint")})"
  override def schema(): StructType = WebSocketStream.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = WebSocketStream.SCHEMA
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream =
        new WebSocketMicroBatchStream(options)
    }
  }
}

/** Offset = count of frames received since this connection opened. */
case class WsOffset(count: Long) extends Offset {
  override def json(): String = count.toString
}

class WebSocketMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val endpoint = Option(options.get("endpoint")).getOrElse(
    throw new IllegalArgumentException("websocket source requires endpoint"))
  // eager URI/scheme validation: a malformed endpoint must fail the
  // query at construction, not disappear into the reconnect loop
  private val endpointUri = {
    val u = URI.create(endpoint)
    val scheme = Option(u.getScheme).map(_.toLowerCase(
      java.util.Locale.ROOT)).getOrElse("")
    if (scheme != "ws" && scheme != "wss")
      throw new IllegalArgumentException(
        s"websocket endpoint must be ws:// or wss://, got: $endpoint")
    u
  }
  private val requests =
    WebSocketStream.parseRequests(options.getOrDefault("requests", ""))
  private val heartbeats = WebSocketStream.parseRequests(
    options.getOrDefault("heartbeatRequests", ""))
  private val heartbeatIntervalSec =
    options.getLong("heartbeatIntervalSeconds", 0L)
  private val requestIntervalMs =
    options.getLong("requestIntervalSeconds", 0L) * 1000L

  // driver-side frame buffer: (payload bytes, receive micros).
  // `base` = count of frames already committed and dropped, so
  // offset k lives at frames(k - base).
  private val lock = new Object
  private val frames = mutable.ArrayBuffer[(Array[Byte], Long)]()
  @volatile private var base = 0L
  @volatile private var stopped = false
  @volatile private var socket: WebSocket = _

  private val scheduler = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-websocket")
    t.setDaemon(true)
    t
  })

  private def enqueue(bytes: Array[Byte]): Unit = lock.synchronized {
    frames += ((bytes, System.currentTimeMillis() * 1000L))
  }

  private final class Listener extends WebSocket.Listener {
    // partial frames accumulate until last=true (the listener
    // contract delivers one logical message in pieces)
    private val text = new StringBuilder
    private val bin = new java.io.ByteArrayOutputStream
    override def onOpen(ws: WebSocket): Unit = {
      ws.request(1)
      requests.zipWithIndex.foreach { case (r, i) =>
        scheduler.schedule(new Runnable {
          def run(): Unit = sendSerial(ws, r)
        }, requestIntervalMs * i, TimeUnit.MILLISECONDS)
      }
    }
    override def onText(ws: WebSocket, data: CharSequence,
        last: Boolean): CompletionStage[_] = {
      text.append(data)
      if (last) {
        enqueue(text.toString.getBytes(StandardCharsets.UTF_8))
        text.clear()
      }
      ws.request(1)
      null
    }
    override def onBinary(ws: WebSocket, data: ByteBuffer,
        last: Boolean): CompletionStage[_] = {
      val b = new Array[Byte](data.remaining())
      data.get(b)
      bin.write(b)
      if (last) {
        enqueue(bin.toByteArray)
        bin.reset()
      }
      ws.request(1)
      null
    }
    override def onClose(ws: WebSocket, statusCode: Int,
        reason: String): CompletionStage[_] = {
      scheduleReconnect()
      null
    }
    override def onError(ws: WebSocket, error: Throwable): Unit =
      scheduleReconnect()
  }

  // one client for the stream's lifetime: a client per reconnect
  // attempt would leak a selector thread + pool per attempt on a
  // flapping endpoint (they linger until GC)
  private val client = HttpClient.newHttpClient()

  /** java.net.http.WebSocket forbids a second text send while one is
    * outstanding (the violating send fails its future, silently here
    * since nothing awaited it) — so every send runs on the
    * single-threaded scheduler and joins its future: sends can never
    * overlap, and a failure is logged instead of vanishing. The
    * connection-level recovery stays with onError/onClose. */
  private def sendSerial(ws: WebSocket, msg: String): Unit =
    try ws.sendText(msg, true).join()
    catch {
      case t: Throwable =>
        log.warn(s"websocket send failed (${t.getMessage}); " +
          "relying on reconnect")
    }

  private def connect(): Unit =
    if (!stopped)
      socket = client.newWebSocketBuilder()
        .buildAsync(endpointUri, new Listener).join()

  private def scheduleReconnect(): Unit =
    if (!stopped)
      scheduler.schedule(new Runnable {
        def run(): Unit =
          try connect()
          catch { case _: Throwable => scheduleReconnect() }
      }, 1, TimeUnit.SECONDS)

  // the initial connect gets the same 1 s-backoff retry as any later
  // drop: a query started during a transient endpoint outage comes up
  // when the endpoint does (URI/scheme errors failed eagerly above)
  try connect()
  catch {
    case t: Throwable =>
      log.warn(s"websocket initial connect to $endpoint failed " +
        s"(${t.getMessage}); retrying")
      scheduleReconnect()
  }
  if (heartbeats.nonEmpty && heartbeatIntervalSec > 0)
    scheduler.scheduleAtFixedRate(new Runnable {
      def run(): Unit = {
        val ws = socket
        if (ws != null && !stopped)
          heartbeats.foreach(h => sendSerial(ws, h))
      }
    }, heartbeatIntervalSec, heartbeatIntervalSec, TimeUnit.SECONDS)

  // NOTE: synchronized blocks below are statement-form (result via
  // local var) — value-returning synchronized over primitives can
  // emit unverifiable bytecode (operand-stack adaptation inside the
  // monitor's exception-handler region)
  private def frontier(): Long = {
    var n = 0L
    lock.synchronized { n = base + frames.size.toLong }
    n
  }

  override def initialOffset(): Offset = WsOffset(base)
  override def latestOffset(): Offset = WsOffset(frontier())
  // a restarted query's checkpointed offset refers to a PREVIOUS
  // connection's frames, which are gone — clamp to the live range
  // (at-most-once, documented)
  override def deserializeOffset(json: String): Offset =
    WsOffset(math.min(math.max(json.trim.toLong, base), frontier()))
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WsOffset].count
    val e = end.asInstanceOf[WsOffset].count
    var slice = Array.empty[(Array[Byte], Long)]
    lock.synchronized {
      slice = frames.slice((s - base).toInt, (e - base).toInt).toArray
    }
    if (slice.isEmpty) Array.empty
    else Array(WsPartition(slice))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WsReaderFactory
  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[WsOffset].count
    val drop = (e - base).toInt
    if (drop > 0) {
      frames.dropInPlace(drop)
      base = e
    }
  }
  override def stop(): Unit = {
    stopped = true
    scheduler.shutdownNow()
    val ws = socket
    if (ws != null)
      try ws.abort()
      catch { case _: Throwable => }
  }
}

case class WsPartition(rows: Array[(Array[Byte], Long)])
    extends InputPartition

class WsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[WsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val (payload, micros) = rows(i)
        InternalRow(payload, micros)
      }
      override def close(): Unit = {}
    }
  }
}
