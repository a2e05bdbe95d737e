package graft

import graft.streaming.StreamRunner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.io.{InputStream, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64

/** Websocket source end-to-end against a minimal local RFC 6455
  * server (handshake + unmasked text frames — the public spec, no
  * libraries). */
class WebSocketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Minimal websocket server: accepts EVERY connection (a pipeline
    * consuming both the main output and `.failures` runs two
    * independent streaming queries, i.e. two subscriptions — the
    * same documented caveat as the http source), performs the RFC
    * 6455 upgrade, records the client's first text frame (the
    * subscription request), then sends `messages` as text frames and
    * holds the connection open. */
  private def startServer(messages: Seq[String],
      received: java.util.concurrent.BlockingQueue[String])
      : (ServerSocket, Thread) = {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val conn = new Thread(() => {
            try {
              val in = sock.getInputStream
              val out = sock.getOutputStream
              handshake(in, out)
              // client's subscription arrives as a MASKED frame
              received.put(readTextFrame(in))
              messages.foreach(m => writeTextFrame(out, m))
              // hold open until the test closes the server socket
              while (!server.isClosed) Thread.sleep(50)
            } catch { case _: Throwable => }
          }, "ws-test-conn")
          conn.setDaemon(true)
          conn.start()
        }
      } catch { case _: Throwable => }
    }, "ws-test-server")
    t.setDaemon(true)
    t.start()
    (server, t)
  }

  private def handshake(in: InputStream, out: OutputStream): Unit = {
    val req = new StringBuilder
    var prev = 0
    while (!req.endsWith("\r\n\r\n")) {
      val c = in.read()
      require(c >= 0, "client closed during handshake")
      req.append(c.toChar)
      prev = c
    }
    val key = req.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(fail("no Sec-WebSocket-Key header"))
    // RFC 6455 §4.2.2: accept = b64(sha1(key + fixed GUID))
    val accept = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
          .getBytes(StandardCharsets.US_ASCII)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII))
    out.flush()
  }

  /** Server→client frames are unmasked (RFC 6455 §5.1). */
  private def writeTextFrame(out: OutputStream, text: String): Unit = {
    val payload = text.getBytes(StandardCharsets.UTF_8)
    require(payload.length < 126, "test frames stay short")
    out.write(0x81) // FIN + text opcode
    out.write(payload.length)
    out.write(payload)
    out.flush()
  }

  /** Client→server frames are masked; unmask per §5.3. Skips
    * control frames. */
  private def readTextFrame(in: InputStream): String = {
    while (true) {
      val b0 = in.read()
      val b1 = in.read()
      require(b0 >= 0 && b1 >= 0, "client closed")
      val opcode = b0 & 0x0f
      val masked = (b1 & 0x80) != 0
      var len = (b1 & 0x7f).toLong
      if (len == 126) len = (in.read() << 8) | in.read()
      else if (len == 127) {
        len = 0
        for (_ <- 0 until 8) len = (len << 8) | in.read()
      }
      val mask = if (masked) Array.fill(4)(in.read().toByte)
        else Array.empty[Byte]
      val payload = new Array[Byte](len.toInt)
      var off = 0
      while (off < len) {
        val n = in.read(payload, off, len.toInt - off)
        require(n > 0, "client closed mid-frame")
        off += n
      }
      if (masked)
        for (i <- payload.indices)
          payload(i) = (payload(i) ^ mask(i % 4)).toByte
      if (opcode == 1)
        return new String(payload, StandardCharsets.UTF_8)
      // else: control/other frame — keep reading
    }
    throw new IllegalStateException("unreachable")
  }

  test("websocket source: heartbeats fire on the timer and a dropped " +
      "connection reconnects and resubscribes") {
    val received =
      new java.util.concurrent.LinkedBlockingQueue[String]()
    // server that closes the socket after the subscription, forcing
    // the client's reconnect path; the second connection stays up
    val server = new ServerSocket(0)
    @volatile var connections = 0
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          connections += 1
          val myConn = connections
          val conn = new Thread(() => {
            try {
              val in = sock.getInputStream
              val out = sock.getOutputStream
              handshake(in, out)
              received.put(readTextFrame(in)) // subscription
              if (myConn == 1) sock.close() // drop first connection
              else {
                // second connection: collect heartbeats
                while (!server.isClosed)
                  received.put(readTextFrame(in))
              }
            } catch { case _: Throwable => }
          }, "ws-hb-conn")
          conn.setDaemon(true)
          conn.start()
        }
      } catch { case _: Throwable => }
    }, "ws-hb-server")
    t.setDaemon(true)
    t.start()
    try {
      Pipeline.execute(spark, s"""
        |sources:
        |  - name: hb
        |    module: websocket
        |    parameters:
        |      endpoint: "ws://127.0.0.1:${server.getLocalPort}/"
        |      requests: ["sub"]
        |      heartbeatRequests: ["ping"]
        |      heartbeatIntervalSeconds: 1
        |      format: text
        |sinks:
        |  - name: hbout
        |    module: memory
        |    input: hb
        |""".stripMargin)
      def nextMsg(): String =
        received.poll(20, java.util.concurrent.TimeUnit.SECONDS)
      // the 1 s heartbeat timer runs independently of connection
      // state, so a "ping" can land before either subscription frame
      // (e.g. between reconnect and the resubscribe send) — skip
      // pings when waiting for the subs
      // bounded: if resubscribe-on-reconnect ever breaks while the
      // heartbeat timer keeps feeding pings, an unbounded dropWhile
      // would spin forever — cap the skip so the test FAILS instead
      // of hanging
      def nextSub(): String = Iterator.continually(nextMsg())
        .take(30).dropWhile(_ == "ping")
        .nextOption().orNull
      // first connection: subscription, then the server drops it
      assert(nextSub() === "sub")
      // reconnect: the client resubscribes on the NEW connection
      assert(nextSub() === "sub")
      assert(connections >= 2)
      // heartbeats arrive on the live connection within the timer
      val hb = Iterator.continually(nextMsg())
        .take(5).find(_ == "ping")
      assert(hb.contains("ping"), "no heartbeat within the window")
    } finally {
      StreamRunner.stopAll()
      server.close()
    }
  }

  test("websocket source: every entry of a multi-request " +
      "subscription list arrives (sends are serialized)") {
    // java.net.http.WebSocket rejects overlapping sends — with three
    // zero-interval requests, unserialized sendText calls silently
    // dropped every request after the first
    val received =
      new java.util.concurrent.LinkedBlockingQueue[String]()
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val conn = new Thread(() => {
            try {
              val in = sock.getInputStream
              val out = sock.getOutputStream
              handshake(in, out)
              while (!server.isClosed)
                received.put(readTextFrame(in))
            } catch { case _: Throwable => }
          }, "ws-multi-conn")
          conn.setDaemon(true)
          conn.start()
        }
      } catch { case _: Throwable => }
    }, "ws-multi-server")
    t.setDaemon(true)
    t.start()
    try {
      Pipeline.execute(spark, s"""
        |sources:
        |  - name: ms
        |    module: websocket
        |    parameters:
        |      endpoint: "ws://127.0.0.1:${server.getLocalPort}/"
        |      requests: ["subA", "subB", "subC"]
        |      format: text
        |sinks:
        |  - name: out
        |    module: memory
        |    input: ms
        |""".stripMargin)
      val got = scala.collection.mutable.Set[String]()
      val deadline = System.nanoTime + 20L * 1000 * 1000 * 1000
      while (got.size < 3 && System.nanoTime < deadline) {
        val m = received.poll(1, java.util.concurrent.TimeUnit.SECONDS)
        if (m != null) got += m
      }
      assert(got === Set("subA", "subB", "subC"))
    } finally {
      StreamRunner.stopAll()
      server.close()
    }
  }

  test("websocket source: subscribe, receive json frames, route " +
      "malformed payloads to failures") {
    val received =
      new java.util.concurrent.LinkedBlockingQueue[String]()
    val (server, _) = startServer(
      Seq("""{"k": 1, "v": "a"}""", "not-json",
        """{"k": 2, "v": "b"}"""), received)
    val port = server.getLocalPort
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ws").toString
    try {
      Pipeline.execute(spark, s"""
        |sources:
        |  - name: src
        |    module: websocket
        |    failures:
        |      - name: bad
        |        module: storage
        |        parameters: {output: "$dir/bad", format: json}
        |    parameters:
        |      endpoint: "ws://127.0.0.1:$port/"
        |      requests: [{action: subscribe, channel: trades}]
        |      format: json
        |      schema:
        |        fields:
        |          - {name: k, type: int64}
        |          - {name: v, type: string}
        |sinks:
        |  - name: wsout
        |    module: memory
        |    input: src
        |""".stripMargin)
      // the subscription request must reach the server as sent
      val sub = received.poll(15, java.util.concurrent.TimeUnit.SECONDS)
      assert(sub != null, "server never saw the subscription request")
      assert(sub.contains("subscribe") && sub.contains("trades"))
      // frames arrive asynchronously — poll the memory sink
      val deadline = System.currentTimeMillis() + 30000
      var rows = Seq.empty[(Long, String)]
      while (rows.size < 2 && System.currentTimeMillis() < deadline) {
        StreamRunner.drainAll()
        rows = spark.sql("SELECT k, v FROM wsout")
          .as[(Long, String)].collect().toSeq.sorted
        if (rows.size < 2) Thread.sleep(200)
      }
      assert(rows === Seq((1L, "a"), (2L, "b")))
      // the malformed frame landed in the module-scoped failure sink
      val badDeadline = System.currentTimeMillis() + 15000
      var bad = 0L
      while (bad < 1 && System.currentTimeMillis() < badDeadline) {
        StreamRunner.drainAll()
        bad =
          try spark.read.json(s"$dir/bad")
            .filter(col("record").contains("not-json")).count()
          catch { case _: Throwable => 0L }
        if (bad < 1) Thread.sleep(200)
      }
      assert(bad === 1L)
    } finally {
      StreamRunner.stopAll()
      server.close()
    }
  }
}
