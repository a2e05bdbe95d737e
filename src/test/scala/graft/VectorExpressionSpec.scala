package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native CosineSimilarity expression must be value-identical to
  * the reference tight-loop semantics it replaced (index-ordered
  * double accumulation, min-length clamp, null → null, zero-length →
  * NaN), in BOTH the codegen and interpreted paths. */
class VectorExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The replaced UDF's arithmetic, verbatim. */
  private def refCosine(a: Seq[Float], b: Seq[Float]): java.lang.Double =
    if (a == null || b == null) null
    else {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
    }

  private val cases: Seq[(Seq[Float], Seq[Float])] = {
    val rnd = new scala.util.Random(11)
    val random = (1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(64)
      val m = if (rnd.nextBoolean()) n else 1 + rnd.nextInt(64)
      (Seq.fill(n)((rnd.nextFloat() - 0.5f) * 10f),
        Seq.fill(m)((rnd.nextFloat() - 0.5f) * 10f))
    }
    random ++ Seq(
      (Seq.empty[Float], Seq.empty[Float]), // 0/0 → NaN
      (Seq(0f, 0f), Seq(0f, 0f)), // zero vectors → NaN
      (null, Seq(1f)), (Seq(1f), null), // null → null
      (Seq(1f, 2f, 3f), Seq(1f, 2f)), // length clamp
      (Seq(Float.MaxValue, Float.MinPositiveValue),
        Seq(Float.MaxValue, 1f)))
  }

  private def run(codegen: Boolean): Seq[java.lang.Double] = {
    val mode = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    try {
      val df = cases.toDF("a", "b")
      df.select(graft.functions.TextFunctions.cosine(col("a"), col("b"))
        .as("c")).collect().map(r =>
        if (r.isNullAt(0)) null
        else java.lang.Double.valueOf(r.getDouble(0))).toSeq
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("codegen and interpreted paths both match the reference " +
      "tight-loop bit-for-bit") {
    val want = cases.map { case (a, b) => refCosine(a, b) }
    for (codegen <- Seq(true, false)) {
      val got = run(codegen)
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        val ok =
          if (w == null) g == null
          else if (w.isNaN) g != null && g.isNaN
          else g != null && g.doubleValue() == w.doubleValue()
        assert(ok, s"case $i codegen=$codegen: got $g want $w " +
          s"for ${cases(i)}")
      }
    }
  }

  test("cosine_similarity is callable from the sql module") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("id", "emb")
    val out = Pipeline.transforms("sql")(spark,
      Pipeline.ModuleCfg("q", "sql", Seq("e"), Nil,
        graft.config.Json.parse("""{"sql":
          "SELECT id, round(cosine_similarity(emb, array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 6) AS s FROM e ORDER BY id"}"""),
        graft.config.Json.obj()), Map("e" -> df))("q")
    val got = out.collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 1.0), (2L, 0.0), (3L, 0.707107)))
  }

  test("expression stays inside the codegen span (no ScalaUDF node)") {
    val df = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
      .select(graft.functions.TextFunctions
        .cosine(col("a"), col("b")).as("c"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"),
      "cosine fell back to a UDF — the native expression is gone")
  }

  test("unicode normalize: codegen and interpreted agree with " +
      "java.text.Normalizer; select func stays codegen'd") {
    import org.apache.spark.sql.graft.TextExpressions
    val samples = Seq("café", "café", "Ångström",
      "ẛ̣", "plain ascii", "", "ﬁsh ligature",
      "İstanbul", null)
    val df = samples.toDF("s")
    for (codegen <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try {
        val got = df.select(
          TextExpressions.normalize(col("s"), "NFC").as("nfc"),
          TextExpressions.normalize(col("s"), "NFKC").as("nfkc"),
          TextExpressions.normalize(col("s"), "NFD", strip = true)
            .as("bare")).collect()
        samples.zip(got).foreach { case (in, r) =>
          if (in == null) assert(r.isNullAt(0) && r.isNullAt(2))
          else {
            import java.text.Normalizer
            assert(r.getString(0) ==
              Normalizer.normalize(in, Normalizer.Form.NFC))
            assert(r.getString(1) ==
              Normalizer.normalize(in, Normalizer.Form.NFKC))
            assert(r.getString(2) == Normalizer
              .normalize(in, Normalizer.Form.NFD)
              .replaceAll("\\p{M}+", ""))
          }
        }
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val plan = df.select(TextExpressions.normalize(col("s"), "NFC"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }

  /** The textbook reference the expression must match (and DuckDB
    * does — q89): Jaro with the half-transposition count, Winkler
    * boost p=0.1 over a 4-char common prefix past 0.7. */
  private def refJaroWinkler(a: String, b: String): Double = {
    if (a == b) return 1.0
    val (l1, l2) = (a.length, b.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val w = math.max(l1, l2) / 2 - 1
    val m1 = Array.fill(l1)(false); val m2 = Array.fill(l2)(false)
    var m = 0
    for (i <- 0 until l1) {
      val hi = math.min(i + w + 1, l2)
      var j = math.max(0, i - w)
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    for (i <- 0 until l1 if m1(i)) {
      while (!m2(k)) k += 1
      if (a(i) != b(k)) t += 1
      k += 1
    }
    val j0 = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t / 2).toDouble / m) / 3.0
    if (j0 <= 0.7) j0
    else {
      val pre = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.size
      j0 + pre * 0.1 * (1.0 - j0)
    }
  }

  test("jaro_winkler: 300 random pairs match the textbook reference " +
      "in codegen and interpreted paths") {
    import org.apache.spark.sql.graft.TextExpressions
    val rnd = new scala.util.Random(23)
    def randStr() = {
      val n = rnd.nextInt(12)
      (1 to n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    }
    val pairs = (1 to 300).map(_ => (randStr(), randStr())) ++
      Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), ("", ""),
        ("", "x"), ("CRATE", "TRACE"))
    val df = pairs.toDF("a", "b")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val got = df.select(
          TextExpressions.jaroWinkler(col("a"), col("b"))).collect()
        pairs.zip(got).foreach { case ((a, b), r) =>
          assert(r.getDouble(0) == refJaroWinkler(a, b),
            s"($a, $b) in $mode")
        }
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
