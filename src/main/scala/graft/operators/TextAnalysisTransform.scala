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
      case other =>
        throw new IllegalArgumentException(s"textAnalysis feature: $other")
    }
    df = df.drop("__toks")
    TransformCommon.finishRouted(df, cfg)
  }
}
