package graft

import graft.Pipeline.ModuleCfg
import graft.operators.JoinTransform
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the fuzzy-join measures added in rounds 14–15:
  * the engine's Column-program scores must agree with a direct Scala
  * model on random token strings — symmetry, range, the
  * equal-set ⇔ 1.0 law for token_jaccard, and tokenSort's
  * permutation invariance. One batched join evaluates all generated
  * pairs (per-pair joins would pay plan compilation 60×). */
class JoinMeasurePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val token = Gen.oneOf("a", "bb", "ccc", "dd", "e", "fff")
  private val phrase: Gen[String] =
    Gen.chooseNum(0, 5).flatMap(n => Gen.listOfN(n, token))
      .map(_.mkString(" "))

  private def jaccardModel(a: String, b: String): Option[Double] = {
    def ts(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toSet
    val (x, y) = (ts(a), ts(b))
    val u = (x union y).size
    if (u == 0) None else Some((x intersect y).size.toDouble / u)
  }

  test("token_jaccard matches the set model; symmetric; 1.0 iff " +
      "equal sets; empty-vs-empty scores null") {
    val pairs = Gen.listOfN(60, Gen.zip(phrase, phrase))
      .sample.getOrElse(Nil) ++
      Seq(("a bb", "bb a"), ("", ""), ("a", ""), ("a a bb", "bb a"))
    // threshold 0 keeps every non-null-scoring candidate; ngram
    // blocker skipped in favor of a permissive prefix block via
    // by-pair ids — use leftId/rightId ngram with huge buckets
    val params =
      """{"method":"fuzzy","leftOn":"name","rightOn":"rname",
         "measure":"token_jaccard","threshold":0.0,
         "blocker":"ngram","blockLength":1,"maxBucket":1000000,
         "by":["lid"],"leftId":"lid","rightId":"rid"}"""
    // rename rid -> lid on the right so the by key pairs partners;
    // build frames inline here instead of the helper (by-key form)
    val l = pairs.zipWithIndex.map { case ((a, _), i) => (i.toLong, a) }
      .toDF("lid", "name")
    val r = pairs.zipWithIndex.map { case ((_, b), i) =>
      (i.toLong, i.toLong + 1000L, b) }.toDF("lid", "rid", "rname")
    val out = JoinTransform.build(spark,
      ModuleCfg("pj", "join", Seq("l", "r"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("l" -> l, "r" -> r))("pj")
      .select("lid", "score").collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      val model = jaccardModel(a, b)
      val got = out.get(i.toLong)
      (model, got) match {
        case (None, None) => // both empty → null score → no match row
        case (Some(m), Some(g)) =>
          assert(math.abs(m - g) < 1e-12, s"pair $i ($a | $b)")
          // symmetry law holds in the model; the engine expression
          // is structurally symmetric (intersect/union) — spot-pin
          assert(g >= 0.0 && g <= 1.0)
          if (m == 1.0) assert(
            a.trim.split("\\s+").filter(_.nonEmpty).toSet ==
              b.trim.split("\\s+").filter(_.nonEmpty).toSet)
        case (Some(m), None) =>
          // blocker recall bound: a candidate needs a shared 1-gram.
          // A shared TOKEN implies a shared character, so any pair
          // with jaccard > 0 must surface — only zero-overlap pairs
          // may legitimately miss the block
          assert(m == 0.0,
            s"pair $i ($a | $b): jaccard $m lost by the blocker")
        case (None, Some(g)) =>
          fail(s"pair $i ($a | $b): empty-vs-empty scored $g " +
            "(0/0 must be null and never match)")
      }
    }
  }

  test("tokenSort levenshtein is invariant under token permutation") {
    val base = Gen.listOfN(30,
      Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, token)))
      .sample.getOrElse(Nil).filter(_.nonEmpty)
    val pairs = base.map { toks =>
      val shuffled = new scala.util.Random(toks.hashCode).shuffle(toks)
      (toks.mkString(" "), shuffled.mkString(" "))
    }
    val l = pairs.zipWithIndex.map { case ((a, _), i) => (i.toLong, a) }
      .toDF("lid", "name")
    val r = pairs.zipWithIndex.map { case ((_, b), i) =>
      (i.toLong, i.toLong + 1000L, b) }.toDF("lid", "rid", "rname")
    val out = JoinTransform.build(spark,
      ModuleCfg("pj", "join", Seq("l", "r"), Nil,
        graft.config.Json.parse(
          """{"method":"fuzzy","leftOn":"name","rightOn":"rname",
             "measure":"levenshtein","threshold":0,"tokenSort":true,
             "blocker":"ngram","blockLength":1,"maxBucket":1000000,
             "by":["lid"],"leftId":"lid","rightId":"rid"}"""),
        graft.config.Json.obj()),
      Map("l" -> l, "r" -> r))("pj")
      .select("lid", "score").collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    pairs.indices.foreach { i =>
      assert(out.get(i.toLong).contains(0.0),
        s"pair $i ${pairs(i)}: permutation not identity under " +
          s"tokenSort (got ${out.get(i.toLong)})")
    }
  }
}
