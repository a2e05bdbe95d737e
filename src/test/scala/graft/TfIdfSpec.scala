package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** tfidf transform — oracled end-to-end by q110 (smoothed tf-idf over
  * the documents fixture); these pin the formulas on a hand-computed
  * corpus, bm25, topK ordering, and the guards. */
class TfIdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")

  private def ti(params: String,
      df: org.apache.spark.sql.DataFrame = docs) =
    Pipeline.transforms("tfidf")(spark,
      Pipeline.ModuleCfg("ti", "tfidf", Seq("in"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> df))("ti")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "term", "tf", "df", "score").collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("smoothed tf-idf matches the hand computation") {
    val m = rows(ti("""{"idField": "doc_id", "field": "text"}"""))
    // N=2; idf = ln((1+N)/(1+df)) + 1
    val idf1 = math.log(3.0 / 2.0) + 1.0 // df=1
    assert(m((1L, "a")) == ((2L, 2L, 2.0))) // idf(a)=ln(3/3)+1=1
    assert(math.abs(m((1L, "b"))._3 - idf1) < 1e-12)
    assert(math.abs(m((2L, "c"))._3 - idf1) < 1e-12)
    assert(m.size == 4)
  }

  test("bm25 matches the hand computation (dl, avgdl, k1, b)") {
    val m = rows(ti(
      """{"idField": "doc_id", "field": "text", "scheme": "bm25"}"""))
    // N=2, avgdl=2.5; idf = ln(1 + (N-df+0.5)/(df+0.5))
    val idfA = math.log(1.0 + 0.5 / 2.5)
    val expA1 = idfA * (2.0 * 2.2) /
      (2.0 + 1.2 * (0.25 + 0.75 * 3.0 / 2.5))
    assert(math.abs(m((1L, "a"))._3 - expA1) < 1e-12, m((1L, "a")))
    val idfB = math.log(1.0 + 1.5 / 1.5)
    val expB = idfB * (1.0 * 2.2) /
      (1.0 + 1.2 * (0.25 + 0.75 * 3.0 / 2.5))
    assert(math.abs(m((1L, "b"))._3 - expB) < 1e-12, m((1L, "b")))
  }

  test("topK keeps each doc's best terms with deterministic order") {
    val top = ti(
      """{"idField": "doc_id", "field": "text", "topK": 1}""")
      .select("doc_id", "term", "rank").as[(Long, String, Int)]
      .collect().toSet
    // doc 1: tf(a)=2 beats b; doc 2: idf(c) > idf(a) at equal tf
    assert(top == Set((1L, "a", 1), (2L, "c", 1)))
  }

  test("tokensField arrays, token-less docs still count toward N, " +
      "and guards fire") {
    val df = Seq(
      (1L, Seq("x", "y")), (2L, Seq("x")), (3L, null: Seq[String]))
      .toDF("doc_id", "toks")
    val m = rows(ti(
      """{"idField": "doc_id", "tokensField": "toks"}""", df))
    // N=3 (null-token doc included): idf(x) = ln(4/3)+1
    assert(math.abs(m((1L, "x"))._3 - (math.log(4.0 / 3.0) + 1)) < 1e-12)
    assert(!m.keySet.exists(_._1 == 3L))
    val e = intercept[IllegalArgumentException](ti(
      """{"idField": "doc_id", "scheme": "tfdf"}"""))
    assert(e.getMessage.contains("valid"))
    val e2 = intercept[IllegalArgumentException](ti(
      """{"idField": "nope"}"""))
    assert(e2.getMessage.contains("idField"))
    // bm25 over an all-empty corpus: no (doc, term) rows to score —
    // empty result, no crash (the corpus scalars fold into the plan
    // as one-row broadcasts, so there is no build-time action left
    // to fail)
    assert(ti(
      """{"idField": "doc_id", "scheme": "bm25"}""",
      Seq((1L, ""), (2L, null: String)).toDF("doc_id", "text"))
      .count() == 0)
  }

  test("queriesInput ranks docs per query: distinct query terms " +
      "count once, sum over terms, top-k by (score desc, doc asc)") {
    val corpus = Seq((1L, "a a b"), (2L, "a c"), (3L, "d"))
      .toDF("doc_id", "text")
    val queries = Seq((10L, "a a c"), (11L, "zzz"))
      .toDF("query_id", "text")
    val out = Pipeline.transforms("tfidf")(spark,
      Pipeline.ModuleCfg("ti", "tfidf", Seq("in", "q"), Nil,
        graft.config.Json.parse(
          """{"idField": "doc_id", "field": "text",
             "queriesInput": "q", "topK": 2}"""),
        graft.config.Json.obj()),
      Map("in" -> corpus, "q" -> queries))("ti")
      .select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val byQ = out.groupBy(_._1)
    // query 11 matches nothing → absent entirely
    assert(!byQ.contains(11L))
    // query 10 terms {a, c} (the repeated 'a' counts ONCE): doc 2
    // matches both terms, docs 1 matches only 'a'; doc 3 matches
    // nothing → exactly 2 result rows, doc 2 ranked first
    val q10 = byQ(10L).sortBy(_._4)
    assert(q10.map(t => (t._2, t._4)).toSeq == Seq((2L, 1), (1L, 2)))
    // score is the SUM of the matched per-(doc, term) scores
    val m = rows(ti("""{"idField": "doc_id", "field": "text"}""",
      corpus))
    assert(math.abs(q10.head._3 -
      (m((2L, "a"))._3 + m((2L, "c"))._3)) < 1e-12)
    assert(math.abs(q10(1)._3 - m((1L, "a"))._3) < 1e-12)
  }

  test("retrieval with tokensField requires matching query tokens " +
      "(silent term-mismatch guard), queryTokensField path works") {
    val corpus = Seq((1L, Seq("a!", "b")), (2L, Seq("a!", "c")))
      .toDF("doc_id", "toks")
    val queries = Seq((10L, Seq("a!"))).toDF("query_id", "qtoks")
    def run(params: String) = Pipeline.transforms("tfidf")(spark,
      Pipeline.ModuleCfg("ti", "tfidf", Seq("in", "q"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> corpus, "q" -> queries))("ti")
    // corpus tokenized externally + default query split would
    // silently miss terms ("a!" lowercase-splits to "a!") → loud
    val e = intercept[IllegalArgumentException](run(
      """{"idField": "doc_id", "tokensField": "toks",
         "queriesInput": "q"}"""))
    assert(e.getMessage.contains("queryTokensField"))
    // mirrored direction: pre-tokenized queries over a
    // default-split (lowercased) corpus would also silently miss
    val corpus2 = Seq((1L, "a b")).toDF("doc_id", "text")
    val em = intercept[IllegalArgumentException](
      Pipeline.transforms("tfidf")(spark,
        Pipeline.ModuleCfg("ti", "tfidf", Seq("in", "q"), Nil,
          graft.config.Json.parse(
            """{"idField": "doc_id", "field": "text",
               "queriesInput": "q", "queryTokensField": "qtoks"}"""),
          graft.config.Json.obj()),
        Map("in" -> corpus2, "q" -> queries))("ti"))
    assert(em.getMessage.contains("tokensField on the corpus"),
      em.getMessage)
    // same tokenization on both sides: both docs contain "a!"
    val out = run(
      """{"idField": "doc_id", "tokensField": "toks",
         "queriesInput": "q", "queryTokensField": "qtoks",
         "topK": 5}""")
      .select("query_id", "doc_id").as[(Long, Long)].collect()
    assert(out.map(_._2).sorted.toSeq == Seq(1L, 2L))
  }
}
