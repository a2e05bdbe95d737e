package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes the jdbc sink/source against the embedded Derby that
  * ships with Spark — the first real-database coverage of the
  * batched upsert executor (statement generation alone cannot catch
  * parameter-order or commit bugs). */
class JdbcDerbySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  System.setProperty("derby.stream.error.file",
    new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_derby.log").getAbsolutePath)

  private val url = "jdbc:derby:memory:graftspec;create=true"

  private def exec(sql: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try { c.createStatement().execute(sql) } finally c.close()
  }

  private def mkCfg(table: String, op: String, extra: String) = {
    val params = graft.config.Json.parse(
      s"""{"url": "$url", "table": "$table", "op": "$op",
          $extra "keyFields": ["k"]}""")
    Pipeline.ModuleCfg("wr", "jdbc", Seq("in"), Nil, params, params)
  }

  private def readBack(table: String) =
    Pipeline.build(spark, s"""
      |sources:
      |  - name: back
      |    module: jdbc
      |    parameters: {url: "$url", table: $table}
      |""".stripMargin)("back")

  test("insertOrUpdate merges by key through Derby MERGE") {
    exec("CREATE TABLE up1 (k BIGINT PRIMARY KEY, name VARCHAR(32), v DOUBLE)")
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "v")
    // drive the sink writer directly on the frames (the executed
    // upsert path is what's under test, not config plumbing).
    // numPartitions pinned to 1: EMBEDDED Derby's MERGE has a
    // concurrency bug (page-cache NPE, flaked once under two
    // concurrent batch writers); real server databases take the
    // parallel writers fine, and the dialect SQL under test is
    // identical either way. The parallel per-partition writer path
    // itself stays covered by the q64 insert-mode gate, which writes
    // the source's natural multi-partition frame.
    val cfg = mkCfg("up1", "insertOrUpdate",
      """"batchSize": 2, "numPartitions": 1,""")
    graft.operators.JdbcSink.write(cfg, base)
    // second wave: update k=2, k=3; insert k=4
    val wave2 = Seq((2L, "B", 20.0), (3L, "C", 30.0), (4L, "d", 4.0))
      .toDF("k", "name", "v")
    graft.operators.JdbcSink.write(cfg, wave2)
    val out = readBack("up1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(out === Seq((1L, "a", 1.0), (2L, "B", 20.0),
      (3L, "C", 30.0), (4L, "d", 4.0)))
  }

  test("insertOrDoNothing keeps existing rows through Derby MERGE") {
    exec("CREATE TABLE up2 (k BIGINT PRIMARY KEY, v VARCHAR(16))")
    val cfg = mkCfg("up2", "insertOrDoNothing", "")
    graft.operators.JdbcSink.write(cfg, Seq((1L, "keep")).toDF("k", "v"))
    graft.operators.JdbcSink.write(cfg,
      Seq((1L, "clobber"), (2L, "new")).toDF("k", "v"))
    val out = readBack("up2").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out === Seq((1L, "keep"), (2L, "new")))
  }

  test("microbatch ranged query drains a Derby backlog end-to-end") {
    // tag is a CLOB on purpose: Spark's own jdbc writer maps strings
    // to CLOB, and getObject on one yields a Clob handle the row
    // encoder cannot serialize — the typed getter must read it as a
    // string
    exec("CREATE TABLE mb_events (id BIGINT PRIMARY KEY, " +
      "ts_sec BIGINT, tag CLOB)")
    // rows 10s/70s/130s after an anchor 10 minutes in the past: the
    // stream's FIRST tick emits the whole gap-safe backlog
    val anchor = System.currentTimeMillis() / 1000L - 600L
    Seq(1L -> 10L, 2L -> 70L, 3L -> 130L).foreach { case (id, off) =>
      exec(s"INSERT INTO mb_events VALUES ($id, ${anchor + off}, 't$id')")
    }
    val startIso = java.time.Instant.ofEpochSecond(anchor).toString
    Pipeline.execute(spark, s"""
      |sources:
      |  - name: mb
      |    module: microbatch
      |    parameters:
      |      url: "$url"
      |      sql: "SELECT id, tag FROM mb_events WHERE ts_sec >= $${__EVENT_EPOCH_SECOND_PRE__} AND ts_sec < $${__EVENT_EPOCH_SECOND__}"
      |      startDatetime: "$startIso"
      |      intervalSecond: 60
      |      gapSecond: 30
      |sinks:
      |  - name: mbout
      |    module: memory
      |    input: mb
      |""".stripMargin)
    try {
      val got = (1 to 150).exists { _ =>
        graft.streaming.StreamRunner.drainAll()
        val n = spark.sql("SELECT count(*) FROM mbout").head().getLong(0)
        if (n >= 3) true else { Thread.sleep(200); false }
      }
      assert(got, "microbatch backlog never reached the memory sink")
      val rows = spark.sql("SELECT id, tag FROM mbout").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(rows === Seq((1L, "t1"), (2L, "t2"), (3L, "t3")))
    } finally graft.streaming.StreamRunner.stopAll()
  }

  test("derby upsert binds ON, SET and INSERT params in order") {
    import graft.operators.JdbcSink._
    val cols = Seq("a", "k", "b")
    val sql = upsertStatement("derby", "t", cols, Seq("k"),
      "insertOrUpdate")
    assert(sql ===
      "MERGE INTO t T USING SYSIBM.SYSDUMMY1 ON (T.k = ?)" +
        " WHEN MATCHED THEN UPDATE SET a = ?,b = ?" +
        " WHEN NOT MATCHED THEN INSERT (a,k,b) VALUES (?,?,?)")
    assert(upsertParamOrder("derby", cols, Seq("k"),
      "insertOrUpdate") === Seq(1, 0, 2, 0, 1, 2))
    assert(upsertParamOrder("derby", cols, Seq("k"),
      "insertOrDoNothing") === Seq(1, 0, 1, 2))
    // existing dialects stay identity-bound
    assert(upsertParamOrder("postgresql", cols, Seq("k"),
      "insertOrUpdate") === Seq(0, 1, 2))
  }
}
