package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `textAnalysis` transform — per-document text statistics for
  * training-data curation: language ID (stopword-n-gram heuristic),
  * quality score, token counts (whitespace + BPE-ish), content
  * fingerprint. All codegen'd column expressions; zero shuffles. */
object TextAnalysisTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    var df = TransformCommon.single(cfg, inputs)
    val textField = cfg.params.str("field").getOrElse("text")
    val t = col(textField)
    val features = cfg.params.strArr("features") match {
      case Seq() => Seq("language", "quality", "tokens", "fingerprint")
      case fs => fs
    }
    // repetition/pii are regex-chain + UDF heavy per row (~0.5ms/doc);
    // a one-split input would serialize that onto a single task
    // (measured 2.3s single-task on the q49 gate). The cheap column
    // features never widen — the exchange costs more than they do.
    if (features.exists(f => f == "repetition" || f == "pii"))
      df = TransformCommon.widen(df)
    // tokenize once; every feature references the materialized array
    df = df.withColumn("__toks", tokens(t))
    val tk = col("__toks")
    features.foreach {
      case "language" => df = df.withColumn("lang_id", languageId(t, tk))
      case "quality" => df = df.withColumn("quality", qualityScore(t, tk))
      case "tokens" =>
        df = df.withColumn("n_tokens", size(tk))
          .withColumn("n_tokens_bpe", tokenCountBpe(t))
      case "fingerprint" =>
        df = df.withColumn("fingerprint", xxhash64(concat_ws(" ", tk)))
      case "chars" => df = df.withColumn("n_chars_computed", length(t))
      case "repetition" =>
        // Gopher-style repetition/symbol signals: duplicate-line and
        // duplicate-word fractions, top-bigram fraction, symbol-to-
        // word ratio ("#", "...", "…"). All map-side; the only UDF is
        // the bigram frequency count (imperative by nature).
        df = df
          .withColumn("dup_line_frac", dupFrac(docLines(t)))
          .withColumn("dup_word_frac", dupFrac(tk))
          .withColumn("top_bigram_frac", topGramFracUdf(2)(t))
          .withColumn("symbol_ratio",
            regexp_count(t, lit("#|\\.{3}|…")).cast("double") /
              greatest(size(tk), lit(1)).cast("double"))
      case "pii" =>
        // PII detection/masking (the CCNet/Dolma-style scrub step).
        // Patterns are deliberately RE2-compatible (no lookaround, no
        // backreferences) so an external engine can replicate the
        // masking bit-for-bit; the chain order (email → ip → phone)
        // is part of the contract — each count/mask runs on the
        // previous step's output so digit runs inside an already-
        // masked span are never double-counted.
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val phone = "\\+?\\d{1,3}[-. ]\\d{2,4}[-. ]\\d{3,4}"
        val t1 = regexp_replace(t, email, "[EMAIL]")
        val t2 = regexp_replace(t1, ip, "[IP]")
        val t3 = regexp_replace(t2, phone, "[PHONE]")
        df = df
          .withColumn("pii_emails",
            regexp_count(t, lit(email)).cast("long"))
          .withColumn("pii_ips",
            regexp_count(t1, lit(ip)).cast("long"))
          .withColumn("pii_phones",
            regexp_count(t2, lit(phone)).cast("long"))
          .withColumn("text_masked", t3)
      case "gopher" =>
        // Gopher rule-set quality filter (Rae et al. 2021, table A1):
        // discrete per-rule signals plus the conjunction `gopher_keep`,
        // so curation jobs can both filter and audit WHY a doc fell.
        // "Words" here are whitespace tokens (the paper's unit);
        // stop-word membership uses the normalized token array (tk)
        // so punctuation-adjacent forms ("the,") still count.
        // Thresholds are the paper defaults, each overridable via
        // params (minWords/maxWords/minMeanWordLen/maxMeanWordLen/
        // maxSymbolRatio/maxBulletRatio/maxEllipsisRatio/
        // minAlphaRatio/minStopHits). All map-side Columns: the rule
        // set is a pure projection, zero shuffle at any scale.
        val p = cfg.params
        def thr(name: String, dflt: Double) = p.dbl(name).getOrElse(dflt)
        val minWords = thr("minWords", 50)
        val maxWords = thr("maxWords", 100000)
        val minMeanLen = thr("minMeanWordLen", 3)
        val maxMeanLen = thr("maxMeanWordLen", 10)
        val maxSymbol = thr("maxSymbolRatio", 0.1)
        val maxBullet = thr("maxBulletRatio", 0.9)
        val maxEllipsis = thr("maxEllipsisRatio", 0.3)
        val minAlpha = thr("minAlphaRatio", 0.8)
        val minStop = thr("minStopHits", 2)

        // every count is a single-pass codegen'd regexp_count — the
        // array-HOF forms (filter/split lambdas) are interpreted and
        // re-split the text once per signal, which made this branch
        // ~4x the cost of the equivalent regex scans. Each pattern is
        // count-equivalent to its per-line/per-word predecessor:
        //  - words = maximal non-space runs → "\\S+"
        //  - non-blank line (trim-space semantics) → a line char
        //    other than ' ' ((?m), '.' never crosses \n)
        //  - per-line anchored classes use Java's \s minus \n so a
        //    multiline scan can't merge adjacent lines
        val wsInLine = "[ \\t\\x0B\\f\\r]"
        val nWords = regexp_count(t, lit("\\S+"))
        val nWordsD = greatest(nWords, lit(1)).cast("double")
        // sum(len(word)) == len(text with all whitespace removed)
        val meanLen = round(
          length(regexp_replace(t, "\\s+", "")).cast("double") / nWordsD, 6)
        val symbolRatio = round(
          regexp_count(t, lit("#|\\.{3}|…")).cast("double") / nWordsD, 6)
        val nLinesD = greatest(
          regexp_count(t, lit("(?m)^.*[^ ]")), lit(1)).cast("double")
        val bulletRatio = round(regexp_count(t,
          lit("(?m)^" + wsInLine + "*[•\\-\\*]")).cast("double") /
          nLinesD, 6)
        val ellipsisRatio = round(regexp_count(t,
          lit("(?m)(\\.\\.\\.|…)" + wsInLine + "*$")).cast("double") /
          nLinesD, 6)
        // one match per word containing a letter: the boundary (^ or
        // one space) is consumed, so a word can never double-count
        val alphaRatio = round(regexp_count(t,
          lit("(?:^|\\s)\\S*?\\p{L}")).cast("double") / nWordsD, 6)
        // Gopher's 8-word list; DISTINCT membership hits (the paper:
        // "contain at least two of the following English words").
        // Membership == the tokenizer would emit the word: a maximal
        // [letter/digit/'] run equal to it, case-folded — expressed
        // as a boundary-anchored case-insensitive existence scan so
        // the whole branch stays free of the token-array HOF
        val stopHits = Seq("the", "be", "to", "of", "and", "that",
          "have", "with")
          .map(w => when(t.rlike(
            "(?iu)(?<![\\p{L}\\p{Nd}'])" + w +
              "(?![\\p{L}\\p{Nd}'])"), 1).otherwise(0))
          .reduce(_ + _)
        df = df
          .withColumn("gopher_n_words", nWords.cast("long"))
          .withColumn("gopher_mean_word_len", meanLen)
          .withColumn("gopher_symbol_ratio", symbolRatio)
          .withColumn("gopher_bullet_ratio", bulletRatio)
          .withColumn("gopher_ellipsis_ratio", ellipsisRatio)
          .withColumn("gopher_alpha_ratio", alphaRatio)
          .withColumn("gopher_stop_hits", stopHits.cast("long"))
          // keep references the COLUMNS: repeating the raw
          // expressions here would re-run every scan a second time
          .withColumn("gopher_keep",
            col("gopher_n_words").cast("double")
              .between(minWords, maxWords) &&
              col("gopher_mean_word_len")
                .between(minMeanLen, maxMeanLen) &&
              col("gopher_symbol_ratio") < maxSymbol &&
              col("gopher_bullet_ratio") < maxBullet &&
              col("gopher_ellipsis_ratio") < maxEllipsis &&
              col("gopher_alpha_ratio") > minAlpha &&
              col("gopher_stop_hits") >= minStop)
      case other =>
        throw new IllegalArgumentException(s"textAnalysis feature: $other")
    }
    df = df.drop("__toks")
    TransformCommon.finishRouted(df, cfg)
  }
}
