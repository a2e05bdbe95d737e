package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** profile transform — oracled end-to-end by q112; these pin the
  * per-column stats on a hand-built frame, approx mode, non-atomic
  * skipping, and the guards. */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profile(params: String, df: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("profile")(spark,
      Pipeline.ModuleCfg("pf", "profile", Seq("in"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> df))("pf")

  private val df = Seq(
    (1L, Some(2.0), "x"),
    (2L, None, "y"),
    (3L, Some(4.0), "x"))
    .toDF("id", "v", "s")
    .withColumn("arr", array(col("id")))

  test("per-column stats match the hand computation; arrays skipped") {
    val out = profile("{}", df)
    val m = out.collect().map(r => r.getString(0) -> r).toMap
    assert(m.keySet == Set("id", "v", "s"), "array column must skip")
    val id = m("id")
    assert(id.getLong(1) == 3 && id.getLong(2) == 0 &&
      id.getLong(3) == 3)
    assert(id.getString(4) == "1" && id.getString(5) == "3")
    assert(math.abs(id.getDouble(6) - 2.0) < 1e-12)
    assert(math.abs(id.getDouble(7) - 1.0) < 1e-12) // sample stddev
    val v = m("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(math.abs(v.getDouble(6) - 3.0) < 1e-12)
    val s = m("s")
    assert(s.getLong(3) == 2 && s.getString(4) == "x" &&
      s.getString(5) == "y")
    assert(s.isNullAt(6) && s.isNullAt(7), "strings have no moments")
  }

  test("timestamps render like SQL engines; declared fields narrow " +
      "the profile; approx mode swaps in HLL") {
    val tdf = Seq(1L, 2L).toDF("id")
      .withColumn("ts", timestamp_seconds(col("id") * 86400))
    val out = profile("""{"fields": ["ts"]}""", tdf)
    val r = out.head()
    assert(r.getString(0) == "ts" && r.getString(4).startsWith("1970-01-0"))
    val ap = profile("""{"fields": ["id"], "approx": true}""", tdf)
    assert(ap.head().getLong(3) == 2L) // HLL exact at tiny cardinality
  }

  test("guards: unknown/non-atomic fields and streams fail actionably") {
    val e = intercept[IllegalArgumentException](
      profile("""{"fields": ["nope"]}""", df))
    assert(e.getMessage.contains("nope"))
    val e2 = intercept[IllegalArgumentException](
      profile("""{"fields": ["arr"]}""", df))
    assert(e2.getMessage.contains("non-atomic"))
    val s = spark.readStream.format("rate").load()
    val e3 = intercept[IllegalArgumentException](
      profile("""{"fields": ["value"]}""", s))
    assert(e3.getMessage.contains("batch"))
  }

  test("percentiles: exact KLL quantiles per numeric column in the " +
      "same pass, nulls for non-numerics, fraction-named columns") {
    // 1..100 → p50 = the ⌈0.5·100⌉ = 50th order statistic, p95 = 95,
    // p99.9 = ⌈99.9⌉ = 100 (KLL inclusive-search convention)
    val nums = (1 to 100).map(i => (i.toLong, i.toDouble, "c"))
      .toDF("id", "v", "s")
    val out = profile(
      """{"percentiles": [0.5, 0.95, 0.999]}""", nums)
    assert(out.columns.takeRight(3).toSeq ==
      Seq("p50", "p95", "p99_9"))
    val m = out.collect().map(r => r.getString(0) -> r).toMap
    assert(m("v").getDouble(8) == 50.0 &&
      m("v").getDouble(9) == 95.0 && m("v").getDouble(10) == 100.0)
    assert(m("id").getDouble(8) == 50.0)
    assert(m("s").isNullAt(8) && m("s").isNullAt(10),
      "non-numeric columns have no quantiles")
    // out-of-range fractions fail actionably
    val e = intercept[IllegalArgumentException](
      profile("""{"percentiles": [1.5]}""", nums))
    assert(e.getMessage.contains("out of (0, 1)"))
    // duplicate fractions would emit duplicate column names — an
    // ambiguous frame that breaks only downstream; fail at build
    val e2 = intercept[IllegalArgumentException](
      profile("""{"percentiles": [0.5, 0.50]}""", nums))
    assert(e2.getMessage.contains("duplicate percentiles"))
  }

  private def drift(params: String,
      cur: org.apache.spark.sql.DataFrame,
      base: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("profile")(spark,
      Pipeline.ModuleCfg("pf", "profile", Seq("cur", "base"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("cur" -> cur, "base" -> base))("pf")

  /** Drift read (baselineInput): hand-computed PSI over a skewed
    * shift, edge clamping for out-of-support current values, the
    * degenerate constant-baseline bucketing, null-rate deltas, and
    * the guards. */
  test("drift: hand-computed psi, clamped out-of-range mass, " +
      "constant baseline, null deltas, guards") {
    // baseline uniform on [0, 10): buckets 0..4 get 2 each (B=5);
    // current all mass at 9.5 (bucket 4) plus one at 100 (clamped
    // into bucket 4) and one null
    val base = (0 until 10).map(i => i.toDouble).toDF("x")
    val cur = Seq(Some(9.5), Some(9.5), Some(100.0), None)
      .toDF("x")
    val out = drift(
      """{"baselineInput": "base", "psiBuckets": 5}""", cur, base)
      .collect().head
    assert(out.getString(0) == "x")
    assert(out.getLong(1) == 10 && out.getLong(2) == 4)
    assert(out.getLong(3) == 0 && out.getLong(4) == 1)
    assert(math.abs(out.getDouble(5) - 0.25) < 1e-12) // null-rate delta
    // hand PSI: cb = [2,2,2,2,2] (nb 10), cc = [0,0,0,0,3] (nc 3)
    val psi = (0 until 5).map { i =>
      val p = (2 + 0.5) / (10 + 2.5)
      val q = ((if (i == 4) 3 else 0) + 0.5) / (3 + 2.5)
      (q - p) * math.log(q / p)
    }.sum
    assert(math.abs(out.getDouble(9) - psi) < 1e-12, s"psi ${out.get(9)}")
    // constant baseline: == min → bucket 0, anything else → top
    val cBase = Seq(5.0, 5.0, 5.0).toDF("x")
    val cCur = Seq(5.0, 7.0).toDF("x")
    val out2 = drift(
      """{"baselineInput": "base", "psiBuckets": 4}""", cCur, cBase)
      .collect().head
    // cb = [3,0,0,0]; cc = [1,0,0,1]
    val psi2 = Seq((3, 1), (0, 0), (0, 0), (0, 1)).map { case (b, c) =>
      val p = (b + 0.5) / (3 + 2.0)
      val q = (c + 0.5) / (2 + 2.0)
      (q - p) * math.log(q / p)
    }.sum
    assert(math.abs(out2.getDouble(9) - psi2) < 1e-12)
    // all-null baseline column: no edges — psi null, deltas present
    val nBase = Seq[Option[Double]](None, None).toDF("x")
    val out3 = drift(
      """{"baselineInput": "base"}""", cCur, nBase).collect().head
    assert(out3.isNullAt(9) && !out3.isNullAt(5))
    // categorical psi: top-2 baseline categories (count desc, value
    // asc) + other; a NEW current category lands in the other-bucket
    val sBase = Seq("a", "a", "b", "b", "c").toDF("x")
    val sCur = Seq("a", "z", "z").toDF("x")
    val out4 = drift(
      """{"baselineInput": "base", "psiCategories": 2}""", sCur, sBase)
      .collect().head
    // cats = [a, b] (count 2/2, tie → value asc); other covers c/z
    // cb = [2, 2, 1] (nb 5); cc = [1, 0, 2] (nc 3); B = 3
    val psi4 = Seq((2, 1), (2, 0), (1, 2)).map { case (b, c) =>
      val p = (b + 0.5) / (5 + 1.5)
      val q = (c + 0.5) / (3 + 1.5)
      (q - p) * math.log(q / p)
    }.sum
    assert(math.abs(out4.getDouble(9) - psi4) < 1e-12,
      s"cat psi ${out4.get(9)}")
    assert(out4.isNullAt(8), "categorical has no mean delta")
    // guards: baseline must be a listed, distinct input
    val e = intercept[IllegalArgumentException](drift(
      """{"baselineInput": "nope"}""", cur, base))
    assert(e.getMessage.contains("baselineInput"))
    val eK = intercept[IllegalArgumentException](drift(
      """{"baselineInput": "base", "approx": true, "kllK": 4}""",
      cur, base))
    assert(eK.getMessage.contains("kllK"))
    val e2 = intercept[IllegalArgumentException](
      Pipeline.transforms("profile")(spark,
        Pipeline.ModuleCfg("pf", "profile", Seq("cur", "base"), Nil,
          graft.config.Json.parse("""{"baselineInput": "cur"}"""),
          graft.config.Json.obj()),
        Map("cur" -> cur, "base" -> base)))
    assert(e2.getMessage.contains("FIRST input"))
  }

  test("drift approx: quantile buckets keep resolution under a " +
      "heavy tail where the equi-width grid collapses; both match " +
      "hand computations and provably diverge") {
    // baseline [1,2,3,4,1000]: the outlier stretches an equi-width
    // [1,1000] grid until buckets 1-2 are empty; quantile edges at
    // 1/4,2/4,3/4 (exact sketch, n=5 ≤ k) are the order statistics
    // at first-rank ≥ f·n: [2, 3, 4]
    val base = Seq(1.0, 2.0, 3.0, 4.0, 1000.0).toDF("x")
    val cur = Seq(3.5, 3.5, 900.0).toDF("x")
    def psiOf(cb: Seq[Int], cc: Seq[Int]): Double = {
      val b = cb.length
      val nb = cb.sum; val nc = cc.sum
      cb.zip(cc).map { case (p0, q0) =>
        val p = (p0 + 0.5) / (nb + 0.5 * b)
        val q = (q0 + 0.5) / (nc + 0.5 * b)
        (q - p) * math.log(q / p)
      }.sum
    }
    val approx = drift(
      """{"baselineInput": "base", "psiBuckets": 4, "approx": true,
         "kllK": 64}""", cur, base).collect().head
    // bucket(v) = #edges strictly below v:
    // base → [2,1,1,1]; cur 3.5→2, 900→3 → [0,0,2,1]
    val expA = psiOf(Seq(2, 1, 1, 1), Seq(0, 0, 2, 1))
    assert(math.abs(approx.getDouble(9) - expA) < 1e-12,
      s"approx psi ${approx.get(9)} vs $expA")
    val exact = drift(
      """{"baselineInput": "base", "psiBuckets": 4}""", cur, base)
      .collect().head
    // equi-width [1,1000]: 1..4 all land in bucket 0, 1000 in 3 →
    // [4,0,0,1]; cur 3.5→0, 900→3 → [2,0,0,1]
    val expE = psiOf(Seq(4, 0, 0, 1), Seq(2, 0, 0, 1))
    assert(math.abs(exact.getDouble(9) - expE) < 1e-12,
      s"equi-width psi ${exact.get(9)} vs $expE")
    // the twins provably diverge on this fixture — the approx flag
    // switches bucketing, not just an estimator
    assert(math.abs(expA - expE) > 0.01)
  }

  /** Streaming drift monitor: every closed event-time window's rows
    * must equal the BATCH drift read over that window's slice
    * against the same baseline (same formula, windowed). */
  test("streaming drift monitor matches the batch drift read per " +
      "closed window; guards fire without window or timestampField") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdrift")
      .toString
    val baseDf = (0 until 40).map(i =>
      (i.toLong, i % 10, if (i % 4 == 0) "a" else "b"))
      .toDF("id", "v", "cat")
    val baseDir = s"$dir/base"; baseDf.write.parquet(baseDir)
    // two hourly windows of current data, shifted distribution in
    // window 2; ts = epoch seconds
    val w1 = (0 until 20).map(i => (100L + i, 100L + i, i % 10, "a"))
    val w2 = (0 until 20).map(i => (200L + i, 3700L + i, 5 + i % 5, "c"))
    def stage(file: String,
        rows: Seq[(Long, Long, Int, String)]): Unit = {
      val tmp = s"$dir/tmp-$file"
      rows.toDF("id", "secs", "v", "cat")
        .selectExpr("id", "timestamp_seconds(secs) AS ts", "v", "cat")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val inDir = new java.io.File(s"$dir/in"); inDir.mkdirs()
      java.nio.file.Files.move(part.toPath,
        new java.io.File(inDir, s"$file.parquet").toPath)
    }
    stage("b1", w1)
    Pipeline.execute(spark, s"""
      |sources:
      |  - name: cur
      |    module: storage
      |    parameters: {path: $dir/in, stream: true}
      |  - name: base
      |    module: storage
      |    parameters: {path: $baseDir}
      |transforms:
      |  - name: dr
      |    module: profile
      |    inputs: [cur, base]
      |    strategy: {timestampField: ts, allowedLateness: 1,
      |               window: {type: fixed, size: 3600}}
      |    parameters: {baselineInput: base, fields: [v, cat], psiBuckets: 5}
      |sinks:
      |  - name: sdr
      |    module: memory
      |    input: dr
      |    parameters: {outputMode: append}
      |""".stripMargin)
    graft.streaming.StreamRunner.drainAll()
    stage("b2", w2) // advances the watermark past window 1's end
    graft.streaming.StreamRunner.drainAll()
    // a far-future sentinel closes window 2
    stage("b3", Seq((999L, 999999L, 0, "a")))
    graft.streaming.StreamRunner.drainAll()
    graft.streaming.StreamRunner.stopAll()
    val streamed = spark.sql(
      """SELECT window_start, column, n_base, n_cur, nulls_base,
           nulls_cur, round(null_frac_delta, 9) AS nfd,
           round(mean_cur, 9) AS mc, round(mean_delta, 9) AS md,
           round(psi, 9) AS psi
         FROM sdr WHERE window_start < timestamp'1970-01-02'""")
      .collect().map(r => r.toSeq).toSet
    assert(streamed.nonEmpty)
    // batch replay per window slice
    def slice(rows: Seq[(Long, Long, Int, String)], ws: String) = {
      val cur = rows.toDF("id", "secs", "v", "cat")
        .selectExpr("id", "timestamp_seconds(secs) AS ts", "v", "cat")
      drift("""{"baselineInput": "base", "fields": ["v", "cat"],
               "psiBuckets": 5}""",
        cur, spark.read.parquet(baseDir))
        .selectExpr(s"timestamp'$ws' AS window_start", "column",
          "n_base", "n_cur", "nulls_base", "nulls_cur",
          "round(null_frac_delta, 9) AS nfd",
          "round(mean_cur, 9) AS mc", "round(mean_delta, 9) AS md",
          "round(psi, 9) AS psi")
        .collect().map(_.toSeq).toSet
    }
    val expected = slice(w1, "1970-01-01 00:00:00") ++
      slice(w2, "1970-01-01 01:00:00")
    assert(streamed == expected)
    // guards: missing window / missing baselineInput fail actionably
    val e1 = intercept[IllegalArgumentException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: cur
        |    module: storage
        |    parameters: {path: $dir/in, stream: true}
        |  - name: base
        |    module: storage
        |    parameters: {path: $baseDir}
        |transforms:
        |  - name: dr
        |    module: profile
        |    inputs: [cur, base]
        |    strategy: {timestampField: ts}
        |    parameters: {baselineInput: base, fields: [v]}
        |""".stripMargin)
    }
    assert(e1.getMessage.contains("window"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: cur
        |    module: storage
        |    parameters: {path: $dir/in, stream: true}
        |transforms:
        |  - name: dr
        |    module: profile
        |    inputs: [cur]
        |    parameters: {fields: [v]}
        |""".stripMargin)
    }
    assert(e2.getMessage.contains("drift monitor"), e2.getMessage)
  }
}
