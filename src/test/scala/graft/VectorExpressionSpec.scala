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
}
