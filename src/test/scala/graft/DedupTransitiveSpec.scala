package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Transitive dedup: hash-min component labels over the candidate
  * pair graph. */
class DedupTransitiveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def close(pairs: Seq[(Long, Long)], maxIter: Int = 50) =
    graft.operators.DedupTransform.componentMin(
      pairs.toDF("__id", "__rep_id"), maxIter)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("chains, stars and separate components resolve to cluster minima") {
    // component {1,5,9,12}: chain 12-9-5-1; component {20,30}: direct;
    // singleton pair component {40,41}
    val labels = close(Seq(5L -> 1L, 9L -> 5L, 12L -> 9L,
      30L -> 20L, 41L -> 40L))
    assert(labels === Set(5L -> 1L, 9L -> 1L, 12L -> 1L,
      30L -> 20L, 41L -> 40L))
  }

  test("closure crosses buckets in both directions") {
    // min-id doc appears as the LARGER side of one pair: 3~7 and 3~1
    val labels = close(Seq(7L -> 3L, 3L -> 1L))
    assert(labels === Set(7L -> 1L, 3L -> 1L))
  }

  test("empty pair set yields no labels") {
    assert(close(Nil) === Set.empty[(Long, Long)])
  }

  test("an unconverged graph fails loudly at maxIter") {
    // a 6-hop chain cannot converge in 2 iterations
    val e = intercept[IllegalStateException] {
      close(Seq(2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 6L -> 5L,
        7L -> 6L), maxIter = 2)
    }
    assert(e.getMessage.contains("maxIter"))
  }

  private def runDedup(params: String,
      docs: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("dedup")(spark,
      Pipeline.ModuleCfg("dd", "dedup", Seq("docs"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("docs" -> docs))("dd")

  test("transitive wires through ngram and embedding methods") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "unrelated content entirely about other things altogether")
    ).toDF("doc_id", "text")
    val ng = runDedup(
      """{"method": "ngram", "field": "text", "idField": "doc_id",
          "threshold": 0.8, "transitive": true}""", docs)
      .select("doc_id", "__dup_of").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(ng(2L) == 1L && ng(3L) == 1L && ng(1L) == -1L && ng(4L) == -1L)

    val emb = Seq(
      (1L, Array.fill(8)(1.0f)),
      (2L, Array.fill(8)(1.0f)),
      (3L, Array.fill(8)(1.0f)),
      (4L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val ed = runDedup(
      """{"method": "embedding", "field": "embedding",
          "idField": "vec_id", "dim": 8, "planes": 6,
          "threshold": 0.99, "transitive": true}""", emb)
      .select("vec_id", "__dup_of").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(ed(2L) == 1L && ed(3L) == 1L && ed(1L) == -1L && ed(4L) == -1L)
  }

  test("streaming input fails actionably for corpus-wide methods") {
    val stream = spark.readStream.format("rate").load()
      .selectExpr("value AS doc_id", "CAST(value AS STRING) AS text")
    // simhash streams since the LSH path landed — but only with an
    // event-time horizon declared; without one it fails actionably
    val e = intercept[IllegalArgumentException] {
      runDedup(
        """{"method": "simhash", "field": "text", "idField": "doc_id",
            "transitive": true}""", stream)
    }
    assert(e.getMessage.contains("timestampField"))
    // lines remains corpus-wide (corpus-wide line frequencies):
    // rejected with alternatives named (winnow streams since r20 —
    // fingerprint-bucket owner state)
    val e2 = intercept[IllegalArgumentException] {
      runDedup(
        """{"method": "lines", "field": "text", "idField": "doc_id",
            "transitive": true}""", stream)
    }
    assert(e2.getMessage.contains("bounded"))
  }

  test("dedup module surfaces transitive labels through config") {
    // identical texts guarantee shared buckets regardless of hash
    // mode — this test pins the config-to-closure wiring; chain
    // resolution itself is pinned by the direct componentMin tests
    // above and by the q65 oracle gate on real chained data
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "completely different text about something else entirely")
    ).toDF("doc_id", "text")
    val out = Pipeline.transforms("dedup")(spark,
      Pipeline.ModuleCfg("dd", "dedup", Seq("docs"), Nil,
        graft.config.Json.parse(
          """{"method": "simhash", "field": "text",
              "idField": "doc_id", "transitive": true}"""),
        graft.config.Json.obj()),
      Map("docs" -> docs))("dd")
    val labels = out.select(col("doc_id"), col("__dup_of"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1))).toMap
    // docs 2 and 3 must label to 1 (directly or through each other);
    // doc 4 must stay canonical
    assert(labels(1L) == null)
    assert(labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(4L) == null)
  }
}
