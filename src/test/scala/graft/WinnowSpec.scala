package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Pipeline.ModuleCfg
import graft.operators.DedupTransform

/** `method: winnow` — winnowed fingerprint dedup (Schleimer et al.,
  * SIGMOD 2003). Oracled end-to-end by q127 (md5 audit mode); these
  * pin the paper's detection guarantee, both hash modes, and the
  * edge semantics. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def winnow(params: String,
      df: org.apache.spark.sql.DataFrame) =
    DedupTransform.build(spark,
      ModuleCfg("dd", "dedup", Seq("in"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> df))("dd")

  private def dupMap(out: org.apache.spark.sql.DataFrame) =
    out.select("id", "__dup_of").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  // distinct filler tokens so unrelated docs share no grams
  private def toks(prefix: String, n: Int) =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("guarantee: a shared run of window+ngram-1 tokens is detected") {
    // k=4, w=8: any shared token run of >= 11 tokens must select at
    // least one common fingerprint, whatever its alignment — slide
    // the shared run across many offsets in doc B
    val shared = (0 until 11).map(i => s"run$i").mkString(" ")
    val docs = (1 to 20).map { off =>
      (off.toLong + 10,
        toks(s"b$off-", off) + " " + shared + " " + toks(s"c$off-", 30))
    } :+ (1L, toks("a", 25) + " " + shared + " " + toks("z", 7))
    val out = winnow(
      """{"method":"winnow","field":"text","idField":"id",
         "ngramSize":4,"window":8,"threshold":0.01}""",
      docs.toDF("id", "text"))
    val m = dupMap(out)
    // every doc shares a fingerprint with doc 1 (the min id), so at
    // threshold ~0 all 20 map somewhere; the guarantee is that the
    // candidate stage NEVER misses the pair
    (11L to 30L).foreach { id =>
      assert(m(id).isDefined, s"doc $id: shared 11-token run missed")
    }
  }

  test("exact duplicates flag in both hash modes") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different content here now ok")).toDF("id", "text")
    for (algo <- Seq("", ""","hashAlgo":"md5"""")) {
      val out = winnow(
        s"""{"method":"winnow","field":"text","idField":"id",
           "ngramSize":3,"window":4,"threshold":0.9$algo}""", df)
      val m = dupMap(out)
      assert(m == Map(1L -> None, 2L -> Some(1L), 3L -> None),
        s"hashAlgo='$algo'")
    }
  }

  test("null text is never a candidate; short docs gram as a whole") {
    val df = Seq((1L, "ab cd"), (2L, "ab cd"), (3L, null))
      .toDF("id", "text")
    val out = winnow(
      """{"method":"winnow","field":"text","idField":"id",
         "ngramSize":4,"window":8,"threshold":0.5}""", df)
    val m = dupMap(out)
    // 2-token docs fall into the one-whole-doc-gram branch and still
    // dedup; the null doc maps nowhere
    assert(m == Map(1L -> None, 2L -> Some(1L), 3L -> None))
  }

  test("transitive closure glues fingerprint chains to the min id") {
    // A~B and B~C overlap pairwise at >= 0.5 but A~C do not: only
    // the transitive closure maps C back to A
    val a = toks("s", 12)
    val b = toks("s", 12) + " " + toks("t", 12)
    val c = toks("t", 12)
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
    val base =
      """{"method":"winnow","field":"text","idField":"id",
         "ngramSize":3,"window":4,"threshold":0.3%s}"""
    val flat = dupMap(winnow(base.format(""), df))
    assert(flat(2L) == Some(1L) && flat(3L) == Some(2L))
    val closed = dupMap(winnow(base.format(""","transitive":true"""), df))
    assert(closed(2L) == Some(1L) && closed(3L) == Some(1L))
  }

  test("a low-id superset doc cannot mask a true duplicate pair") {
    // doc 1 embeds the shared text in a much larger document; docs 2
    // and 3 are exact copies of that text. Every fingerprint of 2/3
    // also belongs to 1, so a min-rep-per-bucket candidate scheme
    // would only test (2,1) and (3,1) — both fail the Jaccard
    // threshold against the big doc — and never test (3,2). The
    // capped all-pairs scheme must flag 3 as a dup of 2.
    val shared = (0 until 30).map(i => s"core$i").mkString(" ")
    val df = Seq(
      (1L, toks("pre", 60) + " " + shared + " " + toks("post", 60)),
      (2L, shared),
      (3L, shared)).toDF("id", "text")
    val out = winnow(
      """{"method":"winnow","field":"text","idField":"id",
         "ngramSize":4,"window":8,"threshold":0.6}""", df)
    val m = dupMap(out)
    assert(m(3L) == Some(2L),
      "exact duplicates masked by a low-id superset doc")
    assert(m(2L).isEmpty && m(1L).isEmpty)
  }

  test("over-cap buckets fall back to min-rep pairs, so replicated " +
      "content still dedups; invalid params throw") {
    // 5 identical docs with maxBucket 2: every shared fingerprint's
    // bucket (size 5) is over the cap, but the min-rep fallback still
    // pairs each member with id 1 — and identical docs verify, so
    // whole-document replication is never silently lost to the
    // boilerplate guard
    val run = (0 until 20).map(i => s"hot$i").mkString(" ")
    val df = (1L to 5L).map(i => (i, run)).toDF("id", "text")
    for (params <- Seq(""""maxBucket":2,""", "")) {
      val m = dupMap(winnow(
        s"""{"method":"winnow","field":"text","idField":"id",
           $params"threshold":0.5}""", df))
      assert((2L to 5L).forall(i => m(i) == Some(1L)),
        s"params='$params'")
    }
    val e = intercept[IllegalArgumentException](winnow(
      """{"method":"winnow","field":"text","idField":"id",
         "window":0}""", df).collect())
    assert(e.getMessage.contains("window"))
    val e2 = intercept[IllegalArgumentException](winnow(
      """{"method":"winnow","field":"text","idField":"id",
         "maxBucket":1}""", df).collect())
    assert(e2.getMessage.contains("maxBucket"))
  }

  test("cross-corpus hot PRIMARY bucket pairs against the full " +
      "reference list, not just the min reference id") {
    // 5 primary copies of A with maxBucket 2: every fingerprint of A
    // is ALSO selected by the lower-id reference doc A+Z (prefix
    // winnowing keeps the A-interior window minima identical), so
    // the bucket's min reference id is never the true match — a
    // min-rep-only fallback pairs the copies only with A+Z, which
    // fails the 0.5 verify, and the exact duplicates are silently
    // lost. The per-side split must pair the hot primary against the
    // full (<= cap) reference member list. Oracled end-to-end by
    // q140 on the same construction.
    val a = toks("a", 30)
    val primary = (100L to 104L).map(i => (i, a)).toDF("id", "text")
    val ref = Seq(
      (1L, a + " " + toks("z", 80)), // superset doc, fails verify
      (2L, a)).toDF("id", "text")
    val m = dupMap(DedupTransform.build(spark,
      ModuleCfg("dd", "dedup", Seq("p", "ref"), Nil,
        graft.config.Json.parse(
          """{"method":"winnow","referenceInput":"ref","field":"text",
             "idField":"id","threshold":0.5,"maxBucket":2}"""),
        graft.config.Json.obj()),
      Map("p" -> primary, "ref" -> ref))("dd"))
    assert((100L to 104L).forall(i => m(i) == Some(2L)), m.toString)
  }

  test("cross-corpus: primary rows match the min reference id only") {
    val shared = (0 until 11).map(i => s"run$i").mkString(" ")
    val primary = Seq(
      (100L, toks("p", 5) + " " + shared),
      (101L, toks("q", 40))).toDF("id", "text")
    val ref = Seq(
      (1L, shared + " " + toks("r", 3)),
      (2L, shared)).toDF("id", "text")
    val out = DedupTransform.build(spark,
      ModuleCfg("dd", "dedup", Seq("p", "ref"), Nil,
        graft.config.Json.parse(
          """{"method":"winnow","referenceInput":"ref","field":"text",
             "idField":"id","ngramSize":4,"window":8,
             "threshold":0.3}"""),
        graft.config.Json.obj()),
      Map("p" -> primary, "ref" -> ref))("dd")
    val m = dupMap(out)
    assert(m(100L) == Some(1L) && m(101L).isEmpty)
  }

  test("index action + referenceIsIndex reproduce the raw-text " +
      "cross result; a non-index reference fails actionably") {
    val shared = (0 until 11).map(i => s"run$i").mkString(" ")
    val primary = Seq(
      (100L, toks("p", 5) + " " + shared),
      (101L, toks("q", 40))).toDF("id", "text")
    val ref = Seq(
      (1L, shared + " " + toks("r", 3)),
      (2L, shared)).toDF("id", "text")
    def cross(refIn: org.apache.spark.sql.DataFrame, extra: String) =
      dupMap(DedupTransform.build(spark,
        ModuleCfg("dd", "dedup", Seq("p", "ref"), Nil,
          graft.config.Json.parse(
            s"""{"method":"winnow","referenceInput":"ref",
               "field":"text","idField":"id","ngramSize":4,
               "window":8,"threshold":0.3$extra}"""),
          graft.config.Json.obj()),
        Map("p" -> primary, "ref" -> refIn))("dd"))
    val direct = cross(ref, "")
    // build the index with the dedup module itself, then feed it back
    val idx = DedupTransform.build(spark,
      ModuleCfg("ix", "dedup", Seq("r"), Nil,
        graft.config.Json.parse(
          """{"method":"winnow","action":"index","field":"text",
             "idField":"id","ngramSize":4,"window":8}"""),
        graft.config.Json.obj()),
      Map("r" -> ref))("ix")
    assert(idx.columns.toSeq == Seq("id", "fingerprint"))
    val viaIndex = cross(idx,
      ""","referenceIsIndex":true,"referenceIdField":"id"""")
    assert(viaIndex == direct,
      "index-fed cross dedup must equal the raw-text result")
    val e = intercept[IllegalArgumentException](cross(ref,
      ""","referenceIsIndex":true,"referenceIdField":"id""""))
    assert(e.getMessage.contains("fingerprint"))
  }

  test("union of shard indexes ≡ index of the union corpus " +
      "(incremental onboarding never re-fingerprints)") {
    val shared = (0 until 11).map(i => s"run$i").mkString(" ")
    val shardA = Seq((1L, shared + " " + toks("r", 3))).toDF("id", "text")
    val shardB = Seq((2L, shared), (3L, toks("s", 30))).toDF("id", "text")
    def index(df: org.apache.spark.sql.DataFrame) =
      DedupTransform.build(spark,
        ModuleCfg("ix", "dedup", Seq("r"), Nil,
          graft.config.Json.parse(
            """{"method":"winnow","action":"index","field":"text",
               "idField":"id","ngramSize":4,"window":8}"""),
          graft.config.Json.obj()),
        Map("r" -> df))("ix")
    val unioned = index(shardA).union(index(shardB))
    val full = index(shardA.union(shardB))
    assert(unioned.except(full).count() == 0 &&
      full.except(unioned).count() == 0,
      "sharded index rows must equal the full-rebuild index rows")
    // and the union FEEDS the cross path to the same dup map
    val primary = Seq(
      (100L, toks("p", 5) + " " + shared),
      (101L, toks("q", 40))).toDF("id", "text")
    def cross(refIn: org.apache.spark.sql.DataFrame) =
      dupMap(DedupTransform.build(spark,
        ModuleCfg("dd", "dedup", Seq("p", "ref"), Nil,
          graft.config.Json.parse(
            """{"method":"winnow","referenceInput":"ref",
               "field":"text","idField":"id","ngramSize":4,
               "window":8,"threshold":0.3,
               "referenceIsIndex":true,"referenceIdField":"id"}"""),
          graft.config.Json.obj()),
        Map("p" -> primary, "ref" -> refIn))("dd"))
    assert(cross(unioned) == cross(full))
  }

  test("unrelated docs stay canonical") {
    val df = Seq((1L, toks("a", 40)), (2L, toks("b", 40)),
      (3L, toks("c", 3))).toDF("id", "text")
    val out = winnow(
      """{"method":"winnow","field":"text","idField":"id",
         "ngramSize":4,"window":8,"threshold":0.5}""", df)
    assert(dupMap(out) == Map(1L -> None, 2L -> None, 3L -> None))
  }
}
