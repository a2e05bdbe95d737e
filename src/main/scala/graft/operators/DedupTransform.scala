package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `dedup` transform — large-scale training-data deduplication.
  * Methods (config `method`):
  *
  *  - `exact`: hash-groupBy on normalized content; keeps the
  *    smallest-id representative. One shuffle on the content hash.
  *  - `minhash`: word-shingle MinHash + LSH banding.
  *  - `simhash`: 64-bit SimHash + Hamming-LSH bands.
  *  - `ngram`: char-n-gram MinHash candidates verified by exact
  *    n-gram Jaccard within buckets.
  *  - `embedding`: cosine near-dup via random-hyperplane LSH buckets
  *    + within-bucket cosine verification.
  *
  * PERFORMANCE NOTE: signatures are computed via an explode →
  * codegen'd hash → groupBy(min/sum) pipeline, NOT via nested
  * higher-order array functions. HOF lambdas are interpreted
  * (no codegen) and — worse — Catalyst's CollapseProject inlines a
  * single-use upstream expression into a lambda body, where it is
  * re-evaluated once PER ARRAY ELEMENT (observed 100×+ blowup at
  * 500 docs). The explode form is all codegen'd, shuffles only
  * (doc, 64·long) per doc, and map-side-combines the mins.
  *
  * Output = input plus `__dup_of` (null for canonical docs), or only
  * canonical rows when `keep: "canonical"`.
  */
object DedupTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val df = TransformCommon.single(cfg, inputs)
    val p = cfg.params
    val method = p.str("method").getOrElse("exact")
    val textField = p.str("field").getOrElse("text")
    val idField = p.str("idField").getOrElse(df.columns.head)

    val keepCanonical = p.str("keep")
      .exists(k => k == "canonical" || k == "first")
    if (method == "exact" && keepCanonical) {
      // canonical-only exact dedup: one shuffle, no join, fingerprint
      // computed once — groupBy(fp) → min_by(whole row, id)
      val cols = df.columns.toSeq
      val kept = df
        .groupBy(fingerprint(col(textField)).as("__fp"))
        .agg(min_by(struct(cols.map(col): _*), col(idField)).as("__keep"))
        .select(cols.map(c => col(s"__keep.$c")): _*)
      return TransformCommon.finishRouted(kept, cfg)
    }

    val out = method match {
      case "exact" => exact(df, textField, idField)
      case "minhash" =>
        val m = p.int("numPermutations").getOrElse(64)
        val bands = p.int("bands").getOrElse(16)
        val k = p.int("shingleSize").getOrElse(3)
        val sig = minhashSignatures(
          df.select(col(idField).as("__id"),
            explode(shingles(col(textField), k)).as("__piece")), m)
        lshDedup(df, idField, bandsFromSig(sig, m, bands))
      case "simhash" =>
        val bands = p.int("bands").getOrElse(4)
        val sig = simhashSignatures(
          df.select(col(idField).as("__id"),
            explode(tokens(col(textField))).as("__piece")))
        lshDedup(df, idField, sig.select(col("__id"),
          posexplode(simhashBands(col("__sh"), bands))
            .as(Seq("__band_idx", "__band_hash"))))
      case "ngram" =>
        val n = p.int("ngramSize").getOrElse(5)
        val threshold = p.dbl("threshold").getOrElse(0.8)
        ngramDedup(df, textField, idField, n, threshold)
      case "embedding" =>
        val embField = p.str("field").getOrElse("embedding")
        val dim = p.int("dim").getOrElse(64)
        val planes = p.int("planes").getOrElse(12)
        val threshold = p.dbl("threshold").getOrElse(0.95)
        embeddingDedup(df, embField, idField, dim, planes, threshold)
      case other =>
        throw new IllegalArgumentException(s"dedup method: $other")
    }
    val kept = p.str("keep") match {
      case Some("canonical") | Some("first") =>
        out.filter(col("__dup_of").isNull).drop("__dup_of")
      case _ => out
    }
    TransformCommon.finishRouted(kept, cfg)
  }

  /** Exact dedup: min id per normalized-content hash. groupBy + join
    * back rather than a Window: the aggregate side is only
    * (fingerprint, min_id) — partially aggregated map-side and
    * broadcast-joinable — where a Window would shuffle AND sort every
    * full-width row. */
  def exact(df: DataFrame, textField: String, idField: String): DataFrame = {
    val withFp = df.withColumn("__fp", fingerprint(col(textField)))
    val minIds = withFp.groupBy("__fp")
      .agg(min(col(idField)).as("__min_id"))
    withFp.join(minIds, "__fp")
      .withColumn("__dup_of",
        when(col(idField) =!= col("__min_id"), col("__min_id")))
      .drop("__fp", "__min_id")
  }

  /** (id, piece) rows → (id, sig: array of m per-permutation minima).
    * All codegen'd, and the piece string is hashed ONCE: the m
    * permutations are affine mixes h·a_s + b_s over the base
    * xxhash64 (the standard universal-hash MinHash family) instead of
    * m independent string hashes — string hashing dominates at
    * 32–64 permutations over millions of exploded grams (measured
    * ~2× on the sf0.1 ngram bench). m partial-min aggregates; the
    * shuffle carries one m-long array per doc. */
  def minhashSignatures(pieces: DataFrame, m: Int): DataFrame = {
    val rnd = new scala.util.Random(0x5eed)
    val coeffs = (0 until m).map(_ => (rnd.nextLong() | 1L, rnd.nextLong()))
    val h = xxhash64(col("__piece"))
    val withH = pieces.select(col("__id"), h.as("__h"))
    val mins = coeffs.zipWithIndex.map { case ((a, b), s) =>
      min(col("__h") * lit(a) + lit(b)).as(s"__m$s") }
    withH.groupBy("__id").agg(mins.head, mins.tail: _*)
      .select(col("__id"),
        array((0 until m).map(s => col(s"__m$s")): _*).as("__sig"))
  }

  /** (id, sig) → exploded (id, band_idx, band_hash). sig is a real
    * aggregate-output attribute here, so the band lambda only touches
    * an attr (no recompute hazard). */
  def bandsFromSig(sig: DataFrame, m: Int, bands: Int): DataFrame =
    sig.select(col("__id"),
      posexplode(lshBands(col("__sig"), m, bands))
        .as(Seq("__band_idx", "__band_hash")))

  /** (id, token) rows → (id, __sh: 64-bit simhash). 64 codegen'd
    * conditional sums (bit votes), sign → bit, OR-fold. */
  def simhashSignatures(toks: DataFrame): DataFrame = {
    val h = xxhash64(col("__piece"))
    val votes = (0 until 64).map(b =>
      sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"__v$b"))
    toks.groupBy("__id").agg(votes.head, votes.tail: _*)
      .select(col("__id"),
        (0 until 64).map(b =>
          when(col(s"__v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce((a, c) => a.bitwiseOR(c)).as("__sh"))
  }

  /** Flag docs sharing any band bucket with a smaller id.
    * `bandRows` = (__id, __band_idx, __band_hash). */
  private def lshDedup(df: DataFrame, idField: String,
      bandRows: DataFrame): DataFrame = {
    val bucketMin = bandRows
      .groupBy("__band_idx", "__band_hash")
      .agg(min("__id").as("__bucket_min"))
    val dupMap = bandRows.join(bucketMin, Seq("__band_idx", "__band_hash"))
      .filter(col("__id") > col("__bucket_min"))
      .groupBy(col("__id"))
      .agg(min("__bucket_min").as("__dup_of"))
    df.join(dupMap, col(idField) === dupMap("__id"), "left")
      .drop("__id")
  }

  /** n-gram Jaccard dedup: char-n-gram minhash candidates verified by
    * exact Jaccard within buckets (verification join touches only
    * candidate pairs, never the full corpus cross-product). */
  private def ngramDedup(df: DataFrame, textField: String, idField: String,
      n: Int, threshold: Double): DataFrame = {
    // r = m/bands = 4 hash rows per band: collision prob per band is
    // sim^4, so 8 bands give ~99% recall at sim 0.8 while keeping the
    // false-candidate rate ~50x below r=2 banding (r=2 at sf0.1
    // produced 64k candidate pairs from 5k docs and verification
    // dominated the runtime)
    val m = 32; val bands = 8
    val withG = df.select(col(idField).as("__id"),
      array_distinct(charNgrams(col(textField), n)).as("__g"))
    val sig = minhashSignatures(
      withG.select(col("__id"), explode(col("__g")).as("__piece")), m)
    val bandRows = bandsFromSig(sig, m, bands)
    val bucketRep = bandRows
      .groupBy("__band_idx", "__band_hash")
      .agg(min("__id").as("__rep_id"))
    val candidates = bandRows.join(bucketRep, Seq("__band_idx", "__band_hash"))
      .filter(col("__id") > col("__rep_id"))
      .select("__id", "__rep_id").distinct()
    val gL = withG.select(col("__id"), col("__g"))
    val gR = withG.select(col("__id").as("__rep_id"), col("__g").as("__g_rep"))
    val verified = candidates.join(gL, "__id").join(gR, "__rep_id")
      .filter(jaccard(col("__g"), col("__g_rep")) >= threshold)
      .groupBy(col("__id"))
      .agg(min("__rep_id").as("__dup_of"))
    df.join(verified, col(idField) === verified("__id"), "left")
      .drop("__id")
  }

  /** Embedding cosine near-dup via hyperplane LSH buckets. */
  private def embeddingDedup(df: DataFrame, embField: String,
      idField: String, dim: Int, planes: Int,
      threshold: Double): DataFrame = {
    val slim = df.select(col(idField).as("__id"),
      col(embField).as("__emb"))
      .withColumn("__bucket",
        hyperplaneBucket(col("__emb"), dim, planes, seed = 42L))
    val rep = slim.groupBy("__bucket")
      .agg(min_by(struct(col("__id"), col("__emb")), col("__id")).as("__rep"))
    val dupMap = slim.join(rep, Seq("__bucket"))
      .filter(col("__id") > col("__rep.__id"))
      .filter(cosine(col("__emb"), col("__rep.__emb")) >= threshold)
      .groupBy(col("__id"))
      .agg(min(col("__rep.__id")).as("__dup_of"))
    df.join(dupMap, col(idField) === dupMap("__id"), "left")
      .drop("__id")
  }
}
