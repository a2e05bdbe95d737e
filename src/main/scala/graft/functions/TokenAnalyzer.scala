package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Json._

/** Config-driven analyzer chain for the `tokenize` module (reference
  * `transform/TokenizeTransform.java:62-120` +
  * `util/domain/text/analyzer/TokenAnalyzer.java` — Lucene
  * charFilters → tokenizer → tokenFilters).
  *
  * Spark-side this compiles to ONE tight-loop UDF (string →
  * array<string>) rather than chained higher-order functions:
  * multi-stage `transform()` chains over computed arrays re-evaluate
  * upstream expressions per element after CollapseProject inlining
  * (observed blowup in round 1), while a single UDF evaluates each
  * document exactly once with patterns precompiled per executor.
  *
  * Implemented types (JVM-only subset of the Lucene chain; Japanese /
  * OpenNLP analyzers need external models and stay out of scope per
  * SURVEY §7.5):
  *  - charFilters: PatternReplaceCharFilter, MappingCharFilter,
  *    HTMLStripCharFilter, NormalizeCharFilter (java.text.Normalizer)
  *  - tokenizer: StandardTokenizer (letter/digit runs approximation),
  *    WhitespaceTokenizer, KeywordTokenizer, PatternTokenizer,
  *    SimplePatternTokenizer, SimplePatternSplitTokenizer,
  *    NGramTokenizer
  *  - filters: LowerCaseFilter, UpperCaseFilter, LengthFilter,
  *    StopFilter, KeepWordFilter, PatternReplaceFilter,
  *    ASCIIFoldingFilter, PorterStemFilter, ShingleFilter,
  *    EdgeNGramTokenFilter, LimitTokenCountFilter, FingerprintFilter
  */
object TokenAnalyzer {

  type CharFilter = String => String
  type Tokenizer = String => Seq[String]
  type TokenFilter = Seq[String] => Seq[String]

  /** Serializable compiled chain. */
  case class Chain(charFilters: Seq[CharFilter], tokenizer: Tokenizer,
      filters: Seq[TokenFilter]) extends Serializable {
    def analyze(text: String): Seq[String] = {
      if (text == null) return Seq.empty
      val chars = charFilters.foldLeft(text)((t, f) => f(t))
      filters.foldLeft(tokenizer(chars))((ts, f) => f(ts))
    }
  }

  def compile(cfg: JsonNode): Chain = Chain(
    cfg.arrOf("charFilters").map(charFilter),
    cfg("tokenizer").map(tokenizer).getOrElse(whitespace),
    cfg.arrOf("filters").map(tokenFilter))

  // ---- charFilters --------------------------------------------------

  private def charFilter(c: JsonNode): CharFilter =
    c.str("type").getOrElse("") match {
      case "PatternReplaceCharFilter" =>
        val p = java.util.regex.Pattern.compile(c.str("pattern").getOrElse(
          throw new IllegalArgumentException(
            "PatternReplaceCharFilter requires pattern")))
        val r = c.str("replacement").getOrElse("")
        s => p.matcher(s).replaceAll(r)
      case "MappingCharFilter" =>
        val mappings = c("mappings").map(m =>
          m.names.map(k => k -> m.str(k).get)).getOrElse(Seq.empty)
        s => mappings.foldLeft(s) { case (t, (from, to)) =>
          t.replace(from, to) }
      case "HTMLStripCharFilter" =>
        val tag = java.util.regex.Pattern.compile("(?s)<[^>]*>")
        s => tag.matcher(s).replaceAll("")
      case "NormalizeCharFilter" =>
        val form = java.text.Normalizer.Form.valueOf(
          c.str("form").getOrElse("NFKC").toUpperCase(java.util.Locale.ROOT))
        s => java.text.Normalizer.normalize(s, form)
      case other => throw new IllegalArgumentException(
        s"unsupported charFilter type: $other")
    }

  // ---- tokenizers ---------------------------------------------------

  private val whitespace: Tokenizer = {
    val ws = java.util.regex.Pattern.compile("\\s+")
    s => ws.split(s).toSeq.filter(_.nonEmpty)
  }

  private def tokenizer(c: JsonNode): Tokenizer =
    c.str("type").getOrElse("StandardTokenizer") match {
      case "WhitespaceTokenizer" => whitespace
      case "KeywordTokenizer" => s => if (s.isEmpty) Seq.empty else Seq(s)
      case "StandardTokenizer" | "URLEmailTokenizer" =>
        // letter/digit-run approximation of Lucene's UAX#29 rules
        val p = java.util.regex.Pattern.compile("[^\\p{L}\\p{N}]+")
        s => p.split(s).toSeq.filter(_.nonEmpty)
      case "PatternTokenizer" =>
        val p = java.util.regex.Pattern.compile(c.str("pattern").getOrElse("\\W+"))
        val group = c.int("group").getOrElse(-1)
        if (group < 0) s => p.split(s).toSeq.filter(_.nonEmpty)
        else s => {
          val m = p.matcher(s)
          val out = Seq.newBuilder[String]
          while (m.find()) {
            val g = m.group(group)
            if (g != null && g.nonEmpty) out += g
          }
          out.result()
        }
      case "SimplePatternTokenizer" =>
        val p = java.util.regex.Pattern.compile(c.str("pattern").getOrElse(
          throw new IllegalArgumentException(
            "SimplePatternTokenizer requires pattern")))
        s => {
          val m = p.matcher(s)
          val out = Seq.newBuilder[String]
          while (m.find()) if (m.group().nonEmpty) out += m.group()
          out.result()
        }
      case "SimplePatternSplitTokenizer" =>
        val p = java.util.regex.Pattern.compile(c.str("pattern").getOrElse(
          throw new IllegalArgumentException(
            "SimplePatternSplitTokenizer requires pattern")))
        s => p.split(s).toSeq.filter(_.nonEmpty)
      case "NGramTokenizer" =>
        val min = c.int("minGram").getOrElse(1)
        val max = c.int("maxGram").getOrElse(2)
        s => for {
          start <- 0 until s.length
          size <- min to max
          if start + size <= s.length
        } yield s.substring(start, start + size)
      case other => throw new IllegalArgumentException(
        s"unsupported tokenizer type: $other")
    }

  // ---- tokenFilters -------------------------------------------------

  private def tokenFilter(c: JsonNode): TokenFilter =
    c.str("type").getOrElse("") match {
      case "LowerCaseFilter" => _.map(_.toLowerCase(java.util.Locale.ROOT))
      case "UpperCaseFilter" => _.map(_.toUpperCase(java.util.Locale.ROOT))
      case "LengthFilter" =>
        val min = c.int("min").getOrElse(0)
        val max = c.int("max").getOrElse(Int.MaxValue)
        _.filter(t => t.length >= min && t.length <= max)
      case "StopFilter" =>
        val words = c.strArr("words").toSet
        val ignoreCase = c.bool("ignoreCase").getOrElse(false)
        if (ignoreCase) {
          val lower = words.map(_.toLowerCase(java.util.Locale.ROOT))
          ts => ts.filterNot(t => lower.contains(t.toLowerCase(java.util.Locale.ROOT)))
        } else _.filterNot(words.contains)
      case "KeepWordFilter" =>
        val words = c.strArr("words").toSet
        _.filter(words.contains)
      case "PatternReplaceFilter" =>
        val p = java.util.regex.Pattern.compile(c.str("pattern").getOrElse(
          throw new IllegalArgumentException(
            "PatternReplaceFilter requires pattern")))
        val r = c.str("replacement").getOrElse("")
        val all = c.bool("replaceAll").getOrElse(true)
        _.map(t => if (all) p.matcher(t).replaceAll(r)
          else p.matcher(t).replaceFirst(r))
      case "ASCIIFoldingFilter" =>
        val marks = java.util.regex.Pattern.compile("\\p{M}+")
        _.map(t => marks.matcher(java.text.Normalizer.normalize(
          t, java.text.Normalizer.Form.NFD)).replaceAll(""))
      case "PorterStemFilter" => _.map(PorterStemmer.stem)
      case "ShingleFilter" =>
        val min = c.int("minShingleSize").getOrElse(2)
        val max = c.int("maxShingleSize").getOrElse(2)
        val sep = c.str("tokenSeparator").getOrElse(" ")
        val unigrams = c.bool("outputUnigrams").getOrElse(true)
        ts => {
          val out = Seq.newBuilder[String]
          for (i <- ts.indices) {
            if (unigrams) out += ts(i)
            for (n <- min to max if i + n <= ts.length)
              out += ts.slice(i, i + n).mkString(sep)
          }
          out.result()
        }
      case "EdgeNGramTokenFilter" =>
        val min = c.int("minGram").getOrElse(1)
        val max = c.int("maxGram").getOrElse(2)
        _.flatMap(t => (min to math.min(max, t.length))
          .map(n => t.substring(0, n)))
      case "LimitTokenCountFilter" =>
        val n = c.int("maxTokenCount").getOrElse(1)
        _.take(n)
      case "FingerprintFilter" =>
        // Lucene semantics: dedupe + sort + join into ONE token
        val sep = c.str("separator").getOrElse(" ")
        val max = c.int("maxOutputTokenSize").getOrElse(1024)
        ts => if (ts.isEmpty) Seq.empty else {
          val fp = ts.distinct.sorted.mkString(sep)
          if (fp.length > max) Seq.empty else Seq(fp)
        }
      case other => throw new IllegalArgumentException(
        s"unsupported token filter type: $other")
    }

  /** Martin Porter's stemming algorithm (public algorithm, 1980) —
    * the JVM-only stand-in for Lucene's PorterStemFilter. */
  object PorterStemmer extends Serializable {
    private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y' => i > 0 && !isVowel(w, i - 1)
      case _ => false
    }
    /** measure = number of VC sequences in the stem. */
    private def m(w: String): Int = {
      var count = 0
      var prevVowel = false
      for (i <- 0 until w.length) {
        val v = isVowel(w, i)
        if (prevVowel && !v) count += 1
        prevVowel = v
      }
      count
    }
    private def hasVowel(w: String): Boolean =
      (0 until w.length).exists(isVowel(w, _))
    private def doubleC(w: String): Boolean =
      w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
        !isVowel(w, w.length - 1)
    /** cvc ending where the final c is not w, x or y. */
    private def cvc(w: String): Boolean =
      w.length >= 3 && !isVowel(w, w.length - 3) &&
        isVowel(w, w.length - 2) && !isVowel(w, w.length - 1) &&
        !"wxy".contains(w.charAt(w.length - 1))

    def stem(word: String): String = {
      if (word == null || word.length <= 2) return word
      var w = word.toLowerCase(java.util.Locale.ROOT)
      // step 1a
      if (w.endsWith("sses")) w = w.dropRight(2)
      else if (w.endsWith("ies")) w = w.dropRight(2)
      else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)
      // step 1b
      var extraStep = false
      if (w.endsWith("eed")) {
        if (m(w.dropRight(3)) > 0) w = w.dropRight(1)
      } else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) {
        w = w.dropRight(2); extraStep = true
      } else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) {
        w = w.dropRight(3); extraStep = true
      }
      if (extraStep) {
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz"))
          w += "e"
        else if (doubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
        else if (m(w) == 1 && cvc(w)) w += "e"
      }
      // step 1c
      if (w.endsWith("y") && hasVowel(w.dropRight(1)))
        w = w.dropRight(1) + "i"
      // step 2
      val step2 = Seq("ational" -> "ate", "tional" -> "tion",
        "enci" -> "ence", "anci" -> "ance", "izer" -> "ize",
        "abli" -> "able", "alli" -> "al", "entli" -> "ent",
        "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
        "ation" -> "ate", "ator" -> "ate", "alism" -> "al",
        "iveness" -> "ive", "fulness" -> "ful", "ousness" -> "ous",
        "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
      step2.find(p => w.endsWith(p._1)).foreach { case (suf, rep) =>
        val stem = w.dropRight(suf.length)
        if (m(stem) > 0) w = stem + rep
      }
      // step 3
      val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
        "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
      step3.find(p => w.endsWith(p._1)).foreach { case (suf, rep) =>
        val stem = w.dropRight(suf.length)
        if (m(stem) > 0) w = stem + rep
      }
      // step 4
      val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible",
        "ant", "ement", "ment", "ent", "ou", "ism", "ate", "iti",
        "ous", "ive", "ize")
      step4.find(w.endsWith).foreach { suf =>
        val stem = w.dropRight(suf.length)
        if (m(stem) > 1) w = stem
      }
      if (w.endsWith("ion") && w.length > 3 &&
        "st".contains(w.charAt(w.length - 4)) && m(w.dropRight(3)) > 1)
        w = w.dropRight(3)
      // step 5a
      if (w.endsWith("e")) {
        val stem = w.dropRight(1)
        if (m(stem) > 1 || (m(stem) == 1 && !cvc(stem))) w = stem
      }
      // step 5b
      if (m(w) > 1 && doubleC(w) && w.endsWith("l")) w = w.dropRight(1)
      w
    }
  }
}
