package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-20 review findings: the prebuilt-index
  * validation memo must NOT go stale when the index dir is appended
  * to in place (the increment workflow), and the embed Session fast
  * path must fail loudly on a contract-violating session instead of
  * emitting all-null embeddings. */
class Round20FixesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def intVec(seed: Long, dim: Int): Array[Float] = {
    val a = Array.tabulate(dim)(j =>
      (((seed * 31 + j * 17) % 255 + 255) % 255 - 127).toFloat)
    a(0) = 127f
    a
  }

  test("prebuilt-index validation re-runs after the index dir " +
      "changes: a null-__cell append is caught even though an " +
      "earlier query job validated (and memoized) the same dir") {
    val dim = 8
    val corpus = (1L to 60L).map(i => (i, intVec(i, dim)))
      .toDF("vec_id", "embedding")
    val queries = (1001L to 1003L).map(i => (i, intVec(i * 7, dim)))
      .toDF("vec_id", "embedding")
    val built = Pipeline.transforms("similarity")(spark,
      Pipeline.ModuleCfg("idx", "similarity", Seq("c"), Nil,
        graft.config.Json.parse(
          """{"action": "index", "field": "embedding",
              "idField": "vec_id", "pqM": 4, "pqCodebookSize": 16,
              "centroids": 4, "hashAlgo": "md5"}"""),
        graft.config.Json.obj()),
      Map("c" -> corpus))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-memostale").toString
    built("idx").write.parquet(s"$dir/codes")
    built("idx.codebook").write.parquet(s"$dir/cb")
    built("idx.centroids").write.parquet(s"$dir/cents")
    def query(): org.apache.spark.sql.DataFrame =
      Pipeline.transforms("similarity")(spark,
        Pipeline.ModuleCfg("knn", "similarity",
          Seq("i", "q", "cb", "ct"), Nil,
          graft.config.Json.parse(
            """{"method": "ivf", "field": "embedding",
                "idField": "vec_id", "k": 3, "nProbe": 2,
                "indexInput": "i", "codebookInput": "cb",
                "centroidsInput": "ct"}"""),
          graft.config.Json.obj()),
        Map("i" -> spark.read.parquet(s"$dir/codes"),
          "q" -> queries,
          "cb" -> spark.read.parquet(s"$dir/cb"),
          "ct" -> spark.read.parquet(s"$dir/cents")))("knn")
    // first query job validates the healthy index and memoizes it
    assert(query().count() > 0)
    // the dir then grows IN PLACE by a cell-less increment (the
    // exact corruption the validation exists to catch): rows whose
    // __cell is null can never be reached by an ivf probe
    built("idx")
      .withColumn("__cell",
        org.apache.spark.sql.functions.lit(null).cast("int"))
      .withColumn("vec_id",
        org.apache.spark.sql.functions.col("vec_id") + 1000)
      .write.mode("append").parquet(s"$dir/codes")
    // a memo keyed on the plan alone would skip validation here and
    // serve the unreachable rows silently; the file-set key must
    // re-validate and throw the null-__cell error
    val e = intercept[IllegalArgumentException](query())
    assert(e.getMessage.contains("null __cell"), e.getMessage)
  }

  test("embed fast path fails loudly on a contract-violating " +
      "session: a missing 'out' tensor and a short output both " +
      "name the problem instead of emitting null embeddings") {
    import graft.operators.{MultimodalTransform, OnnxTransform}
    val rows = Seq((1L, 8, 8), (2L, 8, 8)).toDF("doc_id", "w", "h")
    def embed(): Unit = {
      val cfg = Pipeline.ModuleCfg("mm", "multimodal", Seq("in"), Nil,
        graft.config.Json.parse(
          """{"ops": [
              {"op": "generate", "widthField": "w",
               "heightField": "h", "name": "img"},
              {"op": "embed", "field": "img", "model": "stub:bad",
               "grid": 8, "name": "emb"}]}"""),
        graft.config.Json.obj())
      MultimodalTransform.build(spark, cfg, Map("in" -> rows))("mm")
        .collect()
      ()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val prev = OnnxTransform.sessionFactory
    try {
      // wrong tensor name: the error must name the tensors returned
      OnnxTransform.sessionFactory = _ => new OnnxTransform.Session {
        def run(inputs: Map[String, IndexedSeq[Any]], n: Int) =
          Map("embedding" -> IndexedSeq.fill(n)(Array(1.0)))
      }
      val e1 = intercept[Exception](embed())
      assert(chain(e1).exists(m => m.contains("'out' tensor") &&
        m.contains("embedding")), chain(e1))
      // short output: one vector for two inputs
      OnnxTransform.sessionFactory = _ => new OnnxTransform.Session {
        def run(inputs: Map[String, IndexedSeq[Any]], n: Int) =
          Map("out" -> IndexedSeq(Array(1.0)))
      }
      val e2 = intercept[Exception](embed())
      assert(chain(e2).exists(_.contains("one output per row")),
        chain(e2))
    } finally OnnxTransform.sessionFactory = prev
  }
}
