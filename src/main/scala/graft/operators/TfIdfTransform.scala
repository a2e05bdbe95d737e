package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `tfidf` transform — corpus term scoring for curation pipelines
  * (parity-plus: the reference has no term scorer; the pipeline-level
  * needs are keyword extraction, boilerplate triage, and lexical
  * retrieval scoring over training corpora).
  *
  * Tokens come from a whitespace+lowercase split of `field` or an
  * existing array column (`tokensField`, e.g. `tokenize` output —
  * same contract as the chunk module). Output: one row per
  * (document, distinct term) with `tf` (term count in the doc), `df`
  * (documents containing the term), and the scheme score:
  *
  *  - `scheme: tfidf` (default) — sklearn's smoothed variant:
  *    idf = ln((1+N)/(1+df)) + 1, score = tf · idf.
  *  - `scheme: bm25` — Okapi BM25 with `k1` (1.2) / `b` (0.75):
  *    idf = ln(1 + (N−df+0.5)/(df+0.5)),
  *    score = idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
  *
  * `topK` keeps each document's k highest-scoring terms (score desc,
  * term asc — deterministic), adding a 1-based `rank`.
  *
  * Scale shape: explode is map-side; `tf` is ONE shuffle on
  * (doc, term) with partial combine; `df` re-aggregates the already
  * (doc, term)-distinct tf frame (term-keyed, vocabulary-sized);
  * the df re-attach joins on term and AQE broadcasts it when the
  * vocabulary is small. N (and avgdl for bm25) fold into the SAME
  * job as one-row aggregates cross-joined broadcast (the pagerank
  * dangling-mass pattern) — no separate driver action per build.
  * An empty corpus (or an all-empty one under bm25) therefore
  * yields an empty result rather than a build-time error: with no
  * (doc, term) rows there is nothing to score. Nothing
  * document-pair-shaped ever materializes. */
object TfIdfTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    // deliberately NOT widened (r21 A/B): the term explode feeds an
    // aggregation shuffle immediately, so scan-stage parallelism buys
    // nothing here and the extra exchange measured q110 0.49→0.79 s,
    // q136 1.85→2.15 s
    val df = TransformCommon.single(cfg, inputs)
    val p = cfg.params
    TransformCommon.requireBatch(df, "tfidf", cfg.name,
      "document frequencies, corpus size and avgdl are corpus-wide "
        + "statistics no micro-batch can know",
      "Stage the stream to storage and score in a batch stage, or "
        + "window the stream upstream and score each window's batch "
        + "output.")
    val idField = p.str("idField").getOrElse("doc_id")
    require(df.columns.contains(idField),
      s"tfidf ${cfg.name}: idField $idField not in input " +
        s"(${df.columns.mkString(", ")})")
    val field = p.str("field").getOrElse("text")
    val tokensField = p.str("tokensField")
    tokensField.foreach { tf =>
      require(df.schema(tf).dataType.isInstanceOf[ArrayType],
        s"tfidf ${cfg.name}: tokensField $tf must be an array column")
    }
    val scheme = p.str("scheme").getOrElse("tfidf")
    require(Set("tfidf", "bm25")(scheme),
      s"tfidf ${cfg.name}: scheme $scheme (valid: tfidf, bm25)")
    val toks = tokensField.map(col).getOrElse(
      filter(transform(split(col(field).cast(StringType), "\\s+"),
        t => lower(t)), t => t =!= ""))
    // N counts INPUT documents (token-less docs included — they are
    // part of the corpus the idf denominator describes). A one-row
    // aggregate cross-joined broadcast folds it into the main job —
    // one fewer action per build than a driver-side count
    val nFrame = df.agg(count(lit(1)).cast(DoubleType).as("__n"))
    val terms = df
      .select(col(idField), explode(toks).as("__term"))
    val tf = terms
      .groupBy(col(idField), col("__term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf
      .groupBy(col("__term"))
      .agg(count(lit(1)).as("df"))
    val joined = tf.join(dfreq, Seq("__term"))
      .crossJoin(broadcast(nFrame))
    val nCol = col("__n")
    val scored = scheme match {
      case "tfidf" =>
        val idf = log((lit(1.0) + nCol) /
          (lit(1.0) + col("df").cast(DoubleType))) + lit(1.0)
        joined.withColumn("score",
          col("tf").cast(DoubleType) * idf)
      case "bm25" =>
        val k1 = p.dbl("k1").getOrElse(1.2)
        val b = p.dbl("b").getOrElse(0.75)
        // avgdl over docs WITH tokens (dl of an empty doc is 0 and
        // contributes nothing to retrieval; standard convention) —
        // same one-row broadcast fold as N; over an all-empty
        // corpus both the (doc, term) frame and the result are
        // empty, so the null avgdl never scores anything
        val avgdlFrame = terms.groupBy(col(idField))
          .agg(count(lit(1)).as("__dl"))
          .agg(avg(col("__dl")).as("__avgdl"))
        val dl = sum(col("tf")).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(idField)))
        val idf = log(lit(1.0) +
          (nCol - col("df").cast(DoubleType) + lit(0.5)) /
            (col("df").cast(DoubleType) + lit(0.5)))
        val tfd = col("tf").cast(DoubleType)
        joined
          .crossJoin(broadcast(avgdlFrame))
          .withColumn("__dl", dl.cast(DoubleType))
          .withColumn("score", idf * (tfd * lit(k1 + 1.0)) /
            (tfd + lit(k1) *
              (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          .drop("__dl")
    }
    val named = scored
      .select(col(idField), col("__term").as("term"),
        col("tf"), col("df"), col("score"))
    // `queriesInput`: the RETRIEVAL read — a second input of
    // (query_id, query text) ranks corpus documents per query: each
    // distinct query term contributes its (doc, term) score once,
    // summed per (query, doc), top-`topK` docs per query by
    // (score desc, doc asc). Scale shape: the query table is
    // contract-small and broadcasts into the term join (the corpus
    // (doc, term) frame never reshuffles for it); the per-(query,
    // doc) sum partial-combines map-side; the final ranking is the
    // bounded top-k aggregate (≤ k rows per partition per query
    // cross the wire), not a window over all candidates.
    val result = p.str("queriesInput") match {
      case Some(qname) =>
        require(cfg.inputs.contains(qname),
          s"tfidf ${cfg.name}: queriesInput $qname must be listed " +
            s"in inputs (${cfg.inputs.mkString(", ")})")
        val qdf = inputs(qname)
        val qid = p.str("queryIdField").getOrElse("query_id")
        require(qdf.columns.contains(qid),
          s"tfidf ${cfg.name}: queries input needs a $qid column " +
            s"(got ${qdf.columns.mkString(", ")})")
        require(qid != idField,
          s"tfidf ${cfg.name}: queryIdField must differ from " +
            s"idField ($idField) — both appear in the output")
        // query terms must be produced the SAME way as corpus terms:
        // when the corpus tokens came from tokensField (a tokenize
        // module that may strip punctuation, stem, …) the default
        // whitespace+lowercase split would silently miss corpus
        // terms and retrieval would return partial results with no
        // diagnostic — fail loudly instead (r14 advice)
        val qTokensField = p.str("queryTokensField")
        qTokensField.foreach { qt =>
          require(qdf.columns.contains(qt) &&
            qdf.schema(qt).dataType.isInstanceOf[ArrayType],
            s"tfidf ${cfg.name}: queryTokensField $qt must be an " +
              "array column on the queries input")
        }
        if (tokensField.isDefined && qTokensField.isEmpty)
          throw new IllegalArgumentException(
            s"tfidf ${cfg.name}: corpus terms come from tokensField " +
              s"'${tokensField.get}' but the queries would be " +
              "whitespace+lowercase split — query terms can silently " +
              "miss corpus terms; set queryTokensField to an array " +
              "column on the queries input tokenized the same way")
        // ... and the mirrored direction: pre-tokenized queries over
        // a default-split corpus skip the lowercase/empty-filter the
        // corpus terms went through — same silent-miss failure mode
        if (qTokensField.isDefined && tokensField.isEmpty)
          throw new IllegalArgumentException(
            s"tfidf ${cfg.name}: queryTokensField is set but corpus " +
              "terms are the default whitespace+lowercase split — " +
              "raw query tokens would silently miss lowercased " +
              "corpus terms; set tokensField on the corpus so both " +
              "sides tokenize the same way")
        val qToks = qTokensField.map(col).getOrElse {
          val qfield = p.str("queryField").getOrElse(field)
          require(qdf.columns.contains(qfield),
            s"tfidf ${cfg.name}: queries input needs a $qfield " +
              s"column (got ${qdf.columns.mkString(", ")})")
          filter(transform(
            split(col(qfield).cast(StringType), "\\s+"),
            t => lower(t)), t => t =!= "")
        }
        val qTerms = qdf
          .select(col(qid).as("__qid"), explode(qToks).as("term"))
          .distinct()
        val perDoc = named
          .join(broadcast(qTerms), Seq("term"))
          .groupBy(col("__qid"), col(idField))
          .agg(sum(col("score")).as("score"))
        val k = p.int("topK").getOrElse(10)
        require(k > 0, s"tfidf ${cfg.name}: topK must be positive")
        val idType = df.schema(idField).dataType
        val integralId = idType match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        val topAgg =
          if (integralId) graft.functions.TopKFunctions.topKLong(k,
            col("score"), col(idField).cast(LongType))
          else graft.functions.TopKFunctions.topKString(k,
            col("score"), col(idField).cast(StringType))
        perDoc
          .groupBy(col("__qid"))
          .agg(topAgg.as("__top"))
          .select(col("__qid"), posexplode(col("__top")))
          .select(col("__qid").as(qid),
            col("col._2").cast(idType).as(idField),
            col("col._1").as("score"),
            (col("pos") + 1).cast(IntegerType).as("rank"))
      case None =>
        p.int("topK") match {
          case None => named
          case Some(k) =>
            require(k > 0, s"tfidf ${cfg.name}: topK must be positive")
            import org.apache.spark.sql.expressions.Window
            named
              .withColumn("rank", row_number().over(Window
                .partitionBy(col(idField))
                .orderBy(col("score").desc, col("term").asc)))
              .filter(col("rank") <= k)
        }
    }
    TransformCommon.finishRouted(result, cfg)
  }
}
