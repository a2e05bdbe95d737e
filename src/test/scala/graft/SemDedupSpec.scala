package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup: k-means-cell embedding dedup (dedup method `semdedup`).
  * Two planted clusters (x-axis-ish and y-axis-ish directions) with
  * an external 2-id codebook make every assignment, rep choice and
  * verification hand-checkable. */
class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // cell0 = emb(1) direction, cell1 = emb(10) direction
  private val vecs = Seq(
    (1L, Array(1.0f, 0.1f, 0f, 0f)),   // cell0, csim-to-centroid = 1.0
    (2L, Array(1.0f, 0.12f, 0f, 0f)),  // cell0, csim ~0.9999
    (3L, Array(0.9f, 0.3f, 0f, 0f)),   // cell0, csim ~0.97 -> farthest
    (10L, Array(0f, 1.0f, 0f, 0f)),    // cell1, csim = 1.0
    (11L, Array(0.05f, 1.0f, 0f, 0f))  // cell1, csim ~0.9988 -> farthest
  )

  private def run(params: String) = {
    val df = vecs.toDF("vec_id", "embedding")
    Pipeline.transforms("dedup")(spark,
      Pipeline.ModuleCfg("dd", "dedup", Seq("emb"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("emb" -> df))("dd")
  }

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("vec_id", "__dup_of").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

  test("centroidFar keeps the doc least similar to its centroid") {
    val out = labels(run(
      """{"method": "semdedup", "field": "embedding",
          "idField": "vec_id", "threshold": 0.9,
          "codebookIds": [1, 10]}"""))
    // cell0 rep = 3 (farthest from centroid); 1 and 2 fold into it
    // cell1 rep = 11; 10 folds into it
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> -1L,
      10L -> 11L, 11L -> -1L))
  }

  test("minId keeps the smallest id per cell") {
    val out = labels(run(
      """{"method": "semdedup", "field": "embedding",
          "idField": "vec_id", "threshold": 0.9,
          "repPolicy": "minId", "codebookIds": [1, 10]}"""))
    assert(out === Map(1L -> -1L, 2L -> 1L, 3L -> 1L,
      10L -> -1L, 11L -> 10L))
  }

  test("threshold gates the within-cell fold") {
    // 0.999: in cell0 only 1~2 remain near-dups of the rep... but the
    // rep is 3, to which neither is that close -> nothing flagged in
    // cell0; in cell1 cosine(10, 11) ~0.9988 < 0.999 -> unflagged too
    val out = labels(run(
      """{"method": "semdedup", "field": "embedding",
          "idField": "vec_id", "threshold": 0.999,
          "codebookIds": [1, 10]}"""))
    assert(out === Map(1L -> -1L, 2L -> -1L, 3L -> -1L,
      10L -> -1L, 11L -> -1L))
  }

  test("keep canonical drops folded docs and the helper column") {
    val out = run(
      """{"method": "semdedup", "field": "embedding",
          "idField": "vec_id", "threshold": 0.9, "keep": "canonical",
          "codebookIds": [1, 10]}""")
    assert(!out.columns.contains("__dup_of"))
    assert(out.select("vec_id").collect().map(_.getLong(0)).toSet
      === Set(3L, 11L))
  }

  test("auto-fit path folds exact duplicates without a codebook") {
    val df = (Seq(
      (1L, Array(1.0f, 0f, 0f, 0f)),
      (2L, Array(1.0f, 0f, 0f, 0f)),
      (10L, Array(0f, 1.0f, 0f, 0f))
    )).toDF("vec_id", "embedding")
    val out = Pipeline.transforms("dedup")(spark,
      Pipeline.ModuleCfg("dd", "dedup", Seq("emb"), Nil,
        graft.config.Json.parse(
          """{"method": "semdedup", "field": "embedding",
              "idField": "vec_id", "threshold": 0.99,
              "centroids": 2, "repPolicy": "minId"}"""),
        graft.config.Json.obj()),
      Map("emb" -> df))("dd")
    val l = labels(out)
    // identical vectors share a cell whatever the fit produced
    assert(l(2L) == 1L && l(1L) == -1L && l(10L) == -1L)
  }

  test("null embeddings are never flagged nor used as reps") {
    val df = (vecs :+ (99L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    val out = Pipeline.transforms("dedup")(spark,
      Pipeline.ModuleCfg("dd", "dedup", Seq("emb"), Nil,
        graft.config.Json.parse(
          """{"method": "semdedup", "field": "embedding",
              "idField": "vec_id", "threshold": 0.9,
              "codebookIds": [1, 10]}"""),
        graft.config.Json.obj()),
      Map("emb" -> df))("dd")
    val l = labels(out)
    assert(l(99L) == -1L)
    assert(l(1L) == 3L) // the rest is unaffected by the null row
  }

  test("unknown repPolicy fails actionably") {
    val e = intercept[IllegalArgumentException] {
      run("""{"method": "semdedup", "field": "embedding",
             "idField": "vec_id", "repPolicy": "newest",
             "codebookIds": [1, 10]}""")
    }
    assert(e.getMessage.contains("repPolicy"))
  }
}
