package graft

import graft.config.Json
import graft.functions.TokenAnalyzer
import org.scalatest.funsuite.AnyFunSuite

/** Analyzer chains vs Lucene-documented behavior
  * (TokenizeTransform.java:62-120, TokenAnalyzer.java chains). */
class TokenAnalyzerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def analyze(cfgJson: String, text: String): Seq[String] =
    TokenAnalyzer.compile(Json.parse(cfgJson)).analyze(text)

  test("charFilters: html strip, pattern replace, mapping, normalize") {
    assert(analyze("""{"charFilters": [{"type": "HTMLStripCharFilter"}],
        "tokenizer": {"type": "WhitespaceTokenizer"}}""",
      "<b>bold</b> and <a href='x'>link</a>") ==
      Seq("bold", "and", "link"))
    assert(analyze("""{"charFilters": [{"type": "PatternReplaceCharFilter",
        "pattern": "[0-9]+", "replacement": "#"}],
        "tokenizer": {"type": "WhitespaceTokenizer"}}""",
      "a1 b22 c") == Seq("a#", "b#", "c"))
    assert(analyze("""{"charFilters": [{"type": "MappingCharFilter",
        "mappings": {"ß": "ss", "&": "and"}}],
        "tokenizer": {"type": "WhitespaceTokenizer"}}""",
      "groß & klein") == Seq("gross", "and", "klein"))
    assert(analyze("""{"charFilters": [{"type": "NormalizeCharFilter",
        "form": "NFKC"}],
        "tokenizer": {"type": "WhitespaceTokenizer"}}""",
      "ﬁne ４２") == Seq("fine", "42"))
  }

  test("tokenizers: standard, pattern, simple pattern, ngram, keyword") {
    assert(analyze("""{"tokenizer": {"type": "StandardTokenizer"}}""",
      "Hello, world! it's 42.") == Seq("Hello", "world", "it", "s", "42"))
    assert(analyze("""{"tokenizer": {"type": "PatternTokenizer",
        "pattern": ","}}""", "a,b,,c") == Seq("a", "b", "c"))
    assert(analyze("""{"tokenizer": {"type": "PatternTokenizer",
        "pattern": "'([^']+)'", "group": 1}}""",
      "say 'hi' and 'bye'") == Seq("hi", "bye"))
    assert(analyze("""{"tokenizer": {"type": "SimplePatternTokenizer",
        "pattern": "[0-9]+"}}""", "a1b22c333") == Seq("1", "22", "333"))
    assert(analyze("""{"tokenizer": {"type": "NGramTokenizer",
        "minGram": 2, "maxGram": 3}}""", "abcd") ==
      Seq("ab", "abc", "bc", "bcd", "cd"))
    assert(analyze("""{"tokenizer": {"type": "KeywordTokenizer"}}""",
      "as is") == Seq("as is"))
  }

  test("filters: case, length, stop, keep, ascii fold, edge ngram, limit") {
    val base = """{"tokenizer": {"type": "WhitespaceTokenizer"},
      "filters": [%s]}"""
    assert(analyze(base.format("""{"type": "LowerCaseFilter"}"""),
      "Aa BB") == Seq("aa", "bb"))
    assert(analyze(base.format(
      """{"type": "LengthFilter", "min": 2, "max": 3}"""),
      "a bb ccc dddd") == Seq("bb", "ccc"))
    assert(analyze(base.format(
      """{"type": "StopFilter", "words": ["the", "a"], "ignoreCase": true}"""),
      "The cat a dog") == Seq("cat", "dog"))
    assert(analyze(base.format(
      """{"type": "KeepWordFilter", "words": ["cat"]}"""),
      "cat dog") == Seq("cat"))
    assert(analyze(base.format("""{"type": "ASCIIFoldingFilter"}"""),
      "café naïve") == Seq("cafe", "naive"))
    assert(analyze(base.format(
      """{"type": "EdgeNGramTokenFilter", "minGram": 1, "maxGram": 3}"""),
      "run") == Seq("r", "ru", "run"))
    assert(analyze(base.format(
      """{"type": "LimitTokenCountFilter", "maxTokenCount": 2}"""),
      "a b c d") == Seq("a", "b"))
  }

  test("porter stem, shingle, fingerprint filters") {
    val base = """{"tokenizer": {"type": "WhitespaceTokenizer"},
      "filters": [%s]}"""
    assert(analyze(base.format("""{"type": "PorterStemFilter"}"""),
      "running cats quickly happiness agreed") ==
      Seq("run", "cat", "quickli", "happi", "agre"))
    assert(analyze(base.format(
      """{"type": "ShingleFilter", "minShingleSize": 2,
         "maxShingleSize": 2}"""),
      "a b c") == Seq("a", "a b", "b", "b c", "c"))
    assert(analyze(base.format(
      """{"type": "ShingleFilter", "minShingleSize": 2,
         "maxShingleSize": 2, "outputUnigrams": false}"""),
      "a b c") == Seq("a b", "b c"))
    assert(analyze(base.format("""{"type": "FingerprintFilter"}"""),
      "b a b c a") == Seq("a b c"))
  }

  test("full chain through the tokenize module on a DataFrame") {
    val docs = Seq((1L, "<p>The Running CATS</p>"), (2L, ""))
      .toDF("id", "text")
    val dfs = Pipeline.transforms("tokenize")(spark,
      Pipeline.ModuleCfg("tk", "tokenize", Seq("in"), Nil,
        Json.parse("""{"fields": [{
          "name": "tokens", "input": "text",
          "charFilters": [{"type": "HTMLStripCharFilter"}],
          "tokenizer": {"type": "StandardTokenizer"},
          "filters": [
            {"type": "LowerCaseFilter"},
            {"type": "StopFilter", "words": ["the"]},
            {"type": "PorterStemFilter"}]}]}"""),
        Json.obj()), Map("in" -> docs))
    val out = dfs("tk").orderBy("id").collect()
    assert(out(0).getSeq[String](out(0).fieldIndex("tokens")) ==
      Seq("run", "cat"))
    assert(out(1).getSeq[String](out(1).fieldIndex("tokens")).isEmpty)
  }
}
