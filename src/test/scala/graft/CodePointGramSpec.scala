package graft

import graft.functions.TextFunctions
import org.scalatest.funsuite.AnyFunSuite

/** md5 replay mode must hold for non-BMP text: grams iterate Unicode
  * code points exactly like SQL engines' substr()/length(). Golden
  * values below were produced by DuckDB
  * (`substr(lower('a😀BCd'), i, 3)` and `md5(substr('a😀bcd',1,3))`). */
class CodePointGramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("codePointGrams matches DuckDB substr semantics on "
      + "surrogate-pair text") {
    // DuckDB: [(1,'a😀b'), (2,'😀bc'), (3,'bcd')]
    assert(TextFunctions.codePointGrams("a😀bcd", 3).toSeq ==
      Seq("a😀b", "😀bc", "bcd"))
    // whole-string fallback when code points < n
    assert(TextFunctions.codePointGrams("😀b", 3).toSeq == Seq("😀b"))
    // pure BMP unchanged
    assert(TextFunctions.codePointGrams("abcd", 3).toSeq ==
      Seq("abc", "bcd"))
  }

  test("gram md5 digests match DuckDB byte-for-byte (UTF-8)") {
    // DuckDB: SELECT md5(substr('a😀bcd',1,3))
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("a😀b"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    assert(hex == "186ca4f1a2d2ac0d5381177c6719713b")
  }

  test("md5-mode minhash signature over non-BMP text replays from "
      + "the documented formula") {
    val txt = "héllo 😀 wörld 𝄞𝄞 music"
    val m = 8; val k = 5
    val sparkSig = Seq((1L, txt)).toDF("id", "t")
      .select(TextFunctions.minhashSigMd5Udf(k, m, charGrams = true)(
        col("t")).as("s"))
      .collect()(0).getSeq[Long](0)
    // independent replay, straight from the oracle SQL's arithmetic:
    // code-point grams of lower(text); h1..h3 = hex substrings of
    // md5(gram); lane p = (h1 + p*h2 + p^2*h3) mod 2^32; per-lane min
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = TextFunctions.codePointGrams(
      txt.toLowerCase(java.util.Locale.ROOT), k)
    val expected = Array.fill(m)(Long.MaxValue)
    grams.foreach { g =>
      val hx = md.digest(g.getBytes(
        java.nio.charset.StandardCharsets.UTF_8)).map(b => f"$b%02x").mkString
      val h1 = java.lang.Long.parseLong(hx.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(hx.substring(8, 16), 16)
      val h3 = java.lang.Long.parseLong(hx.substring(16, 24), 16)
      for (p <- 0 until m) {
        val v = (h1 + p * h2 + p.toLong * p * h3) & 0xffffffffL
        if (v < expected(p)) expected(p) = v
      }
    }
    assert(sparkSig == expected.toSeq)
  }
}
