package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, LSH band keys, Jaccard/cosine similarity,
  * language-ID heuristics, quality scoring, token counting,
  * fingerprinting. Everything here is either a codegen'd Catalyst
  * column expression or (for vector math) a tight-loop UDF.
  * MinHash/SimHash SIGNATURE computation lives in DedupTransform
  * (explode → groupBy form) — see the NOTE below.
  */
object TextFunctions {

  /** Lowercased word tokens, punctuation stripped. */
  def tokens(text: Column): Column =
    filter(
      split(lower(regexp_replace(text, "[^\\p{L}\\p{Nd}']+", " ")), " "),
      t => t =!= "")

  /** Word k-shingles: overlapping k-grams of the token array.
    * Short docs (< k tokens) yield the whole token join as 1 shingle.
    *
    * Tight-loop UDF, NOT transform()-over-sequence: the token array is
    * a computed expression, and CollapseProject inlines it into the
    * lambda body where the tokenizer regex re-runs once PER SHINGLE —
    * O(words²) work per doc (measured 3× on the sf0.1 minhash bench).
    * The UDF tokenizes each doc exactly once. */
  def shingles(text: Column, k: Int): Column = {
    val f = udf { (s: String) =>
      if (s == null) Seq.empty[String]
      else wordShingles(s, k).toSeq
    }
    f(text)
  }

  /** Character n-grams (for n-gram Jaccard similarity). Tight-loop
    * UDF for the same CollapseProject reason as `shingles`: the
    * lowered text would re-lower once per gram — O(len²) per doc
    * (measured 5× on the sf0.1 ngram-dedup bench). Grams iterate
    * Unicode CODE POINTS (offsetByCodePoints), not UTF-16 units:
    * matches SQL engines' length()/substr() semantics (DuckDB,
    * Trino, BigQuery) so md5-mode gram replays hold for non-BMP text
    * (emoji, supplementary CJK) too — surrogate pairs stay intact
    * inside grams. */
  private[graft] def codePointGrams(t: String, n: Int): Array[String] = {
    val cps = t.codePointCount(0, t.length)
    if (cps < n) return Array(t)
    // slide both window edges by one code point per gram — a
    // tabulate over offsetByCodePoints(0, i) would rescan from the
    // string head per gram, O(len²) per document
    val out = new Array[String](cps - n + 1)
    var start = 0
    var end = t.offsetByCodePoints(0, n)
    var i = 0
    while (i < out.length) {
      out(i) = t.substring(start, end)
      if (i < out.length - 1) {
        start = t.offsetByCodePoints(start, 1)
        end = t.offsetByCodePoints(end, 1)
      }
      i += 1
    }
    out
  }

  def charNgrams(text: Column, n: Int): Column = {
    val f = udf { (s: String) =>
      if (s == null) Seq.empty[String]
      else codePointGrams(
        s.toLowerCase(java.util.Locale.ROOT), n).toSeq
    }
    f(text)
  }

  // NOTE: signature computation deliberately has NO nested-HOF form
  // here — HOF lambdas are interpreted and CollapseProject re-inlines
  // upstream expressions per array element. Whole-signature tight-loop
  // UDFs below do the entire doc → signature computation in one JVM
  // pass: no explode, no wide aggregate, ZERO shuffle — strictly
  // map-side at any scale (the previous explode → groupBy form
  // shuffled one (id, hash) row per shingle and compiled a 32-column
  // min-aggregate class).

  private def xxh64(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        b.length, 42L)
  }

  private def wordTokens(s: String): Array[String] =
    s.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{Nd}']+").filter(_.nonEmpty)

  /** Word k-shingles of a raw string — the ONE construction shared by
    * `shingles` and both minhash signature modes (three divergent
    * copies here once meant a tokenizer fix could silently split the
    * md5-replay signatures from the xx64 mode). Short docs (< k
    * tokens) yield the whole token join as a single shingle. */
  private def wordShingles(s: String, k: Int): Array[String] = {
    val toks = wordTokens(s)
    if (toks.length < k) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - k + 1)(i =>
      toks.slice(i, i + k).mkString(" "))
  }

  /** MinHash signature over word k-shingles in one pass: each shingle
    * is hashed once (xxh64), then mixed through m affine permutations
    * h·a+b while tracking the per-permutation minimum. Null text →
    * null signature (excluded from banding downstream). */
  def minhashSigUdf(k: Int, m: Int,
      charGrams: Boolean = false): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val rnd = new scala.util.Random(0x5eed)
    val coeffs = Array.fill(m)((rnd.nextLong() | 1L, rnd.nextLong()))
    udf { (s: String) =>
      if (s == null) null
      else {
        val pieces: Array[String] =
          if (charGrams)
            codePointGrams(s.toLowerCase(java.util.Locale.ROOT), k)
          else wordShingles(s, k)
        val mins = Array.fill(m)(Long.MaxValue)
        var i = 0
        while (i < pieces.length) {
          val h = xxh64(pieces(i))
          var p = 0
          while (p < m) {
            val v = h * coeffs(p)._1 + coeffs(p)._2
            if (v < mins(p)) mins(p) = v
            p += 1
          }
          i += 1
        }
        mins.toSeq
      }
    }
  }

  /** MinHash signature in cross-engine-reproducible md5 mode: each
    * gram is md5-digested ONCE; the digest's first three 32-bit words
    * (MSB-first, = hex substrings 1-8 / 9-16 / 17-24) seed a
    * Kirsch-Mitzenmacher family, lane p = (h1 + p·h2 + p²·h3) mod
    * 2^32, and the signature is the per-lane minimum over the doc's
    * grams. Every quantity is exact integer arithmetic on the md5
    * hex string, so the signature — and therefore every LSH bucketing
    * decision — can be recomputed bit-for-bit by plain SQL:
    * `min((('0x'||substr(md5(g),1,8))::BIGINT + p*h2 + p*p*h3) %
    * 4294967296)`. One digest per gram keeps this within ~2× of the
    * default xx64 mode (the previous per-seed-digest formulation cost
    * m digests per gram — 32× the arithmetic for the same recall).
    * Char-grams iterate code points (`codePointGrams`), matching SQL
    * substr() for all of Unicode; the remaining caveat is exotic
    * lower() case mappings (see README "md5 replay mode"). Null
    * text → null signature (callers exclude null signatures from
    * banding). */
  def minhashSigMd5Udf(k: Int, m: Int,
      charGrams: Boolean = false): org.apache.spark.sql.expressions.UserDefinedFunction = {
    udf { (s: String) =>
      if (s == null) null
      else {
        val pieces: Array[String] =
          if (charGrams)
            codePointGrams(s.toLowerCase(java.util.Locale.ROOT), k)
          else wordShingles(s, k)
        val md = java.security.MessageDigest.getInstance("MD5")
        val mins = Array.fill(m)(Long.MaxValue)
        var i = 0
        while (i < pieces.length) {
          val d = md.digest(
            pieces(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          val h3 = ((d(8) & 0xffL) << 24) | ((d(9) & 0xffL) << 16) |
            ((d(10) & 0xffL) << 8) | (d(11) & 0xffL)
          var p = 0
          while (p < m) {
            // max h1 + 31·h2 + 961·h3 < 2^42: no signed-64 overflow
            val v = (h1 + p * h2 + p.toLong * p * h3) & 0xffffffffL
            if (v < mins(p)) mins(p) = v
            p += 1
          }
          i += 1
        }
        mins.toSeq
      }
    }
  }

  /** LSH band keys for an md5-mode signature (array<long> of 32-bit
    * lane minima): band b's key is the hex md5 of the `|`-joined
    * decimal lane values — reproducible as
    * `md5(string_agg(mh::VARCHAR, '|' ORDER BY s))` in SQL. */
  def lshBandsMd5(sig: Column, m: Int, bands: Int): Column = {
    val r = m / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|",
        transform(slice(sig, b * r + 1, lit(r)), v => v.cast(StringType)))))
  }

  /** SimHash in cross-engine-reproducible md5 mode: the per-token
    * 64-bit hash is the first 64 bits of md5(token) read MSB-first,
    * and the output is a 64-char '0'/'1' string (bit b at position
    * b+1) instead of a packed long — a SQL engine rebuilds it with
    * hex-digit arithmetic over md5() and string_agg. Vote tie (count
    * 0, including the empty document) → '0'. Null text → null. */
  val simhashMd5Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val votes = new Array[Int](64)
        val toks = wordTokens(s)
        var i = 0
        while (i < toks.length) {
          val d = md.digest(
            toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var b = 0
          while (b < 64) {
            if (((d(b / 8) >> (7 - b % 8)) & 1) == 1) votes(b) += 1
            else votes(b) -= 1
            b += 1
          }
          i += 1
        }
        val sb = new Array[Char](64)
        var b = 0
        while (b < 64) {
          sb(b) = if (votes(b) > 0) '1' else '0'
          b += 1
        }
        new String(sb)
      }
    }

  /** Hamming-LSH band keys for an md5-mode simhash bit string: the
    * 64/bands-char substring per band (`substr` in SQL). */
  def simhashBandsMd5(sh: Column, bands: Int): Column = {
    val width = 64 / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => sh.substr(b * width + 1, lit(width)))
  }

  /** 64-bit SimHash over word tokens in one pass: per-token hash,
    * 64 bit votes, sign → bit. Null text → null. */
  val simhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        val votes = new Array[Int](64)
        val toks = wordTokens(s)
        var i = 0
        while (i < toks.length) {
          val h = xxh64(toks(i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
          i += 1
        }
        var sh = 0L
        var b = 0
        while (b < 64) {
          if (votes(b) > 0) sh |= (1L << b)
          b += 1
        }
        java.lang.Long.valueOf(sh)
      }
    }

  /** LSH band keys: split an m-length signature into `bands` bands of
    * m/bands rows, each hashed to one long. Docs sharing any band key
    * are near-duplicate candidates. */
  def lshBands(sig: Column, m: Int, bands: Int): Column = {
    val r = m / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => hash(slice(sig, b * r + 1, lit(r)), b))
  }

  /** Hamming-LSH band keys for simhash: split 64 bits into `bands`
    * chunks; equal chunk → candidate pair (hamming ≤ 64-64/bands). */
  def simhashBands(sh: Column, bands: Int): Column = {
    val width = 64 / bands
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws("_", b.cast(StringType),
        call_function("shiftright", sh, b * width)
          .bitwiseAND(lit((1L << width) - 1)).cast(StringType)))
  }

  /** Jaccard similarity of two string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Jaccard for arrays already known element-distinct: |a∪b| =
    * |a|+|b|−|a∩b|, so the union's second hash-set build is replaced
    * by two O(1) lengths — same integer counts, bit-identical result.
    * Only valid when BOTH inputs are deduplicated (e.g. via
    * `array_distinct`); on arrays with repeats it overcounts the
    * union. */
  def jaccardDistinct(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter.cast(DoubleType) /
      (size(a) + size(b) - inter).cast(DoubleType)
  }

  /** Cosine similarity of two float-array embeddings — a native
    * codegen'd Catalyst expression
    * (`org.apache.spark.sql.graft.CosineSimilarity`). Previously a
    * tight-loop UDF; the expression removes the per-row encoder
    * deserialization (every element unboxed through `Seq[Float]`)
    * and keeps the comparison inside whole-stage codegen, with
    * BIT-IDENTICAL arithmetic (index-ordered dot/na/nb doubles,
    * min-length clamp, null → null, zero-length → NaN). */
  val cosine: (Column, Column) => Column =
    (a, b) => org.apache.spark.sql.graft.VectorExpressions.cosine(a, b)

  /** Random-hyperplane LSH bucket for an embedding: sign bits of
    * `planes` deterministic projections (seeded, plan-time vectors).
    * Tight-loop UDF for the same reason as cosine. */
  def hyperplaneBucket(emb: Column, dim: Int, planes: Int,
      seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planeVecs: Array[Array[Double]] =
      Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
    val f = udf { (a: Seq[Float]) =>
      if (a == null) null
      else {
        var bucket = 0L
        var p = 0
        while (p < planeVecs.length) {
          val plane = planeVecs(p)
          var dot = 0.0; var i = 0
          val n = math.min(a.length, plane.length)
          while (i < n) { dot += a(i) * plane(i); i += 1 }
          if (dot > 0) bucket |= (1L << p)
          p += 1
        }
        java.lang.Long.valueOf(bucket)
      }
    }
    f(emb)
  }

  /** Hyperplane LSH bucket in cross-engine-reproducible md5 mode:
    * plane p's component i is uniform in [-1, 1), derived from the
    * first 8 hex digits of md5("plane:p:i") — a SQL engine recomputes
    * the identical planes with md5() + hex-digit arithmetic, so
    * bucket assignments replay outside the JVM. Caveat: uniform
    * components are symmetric but not rotation-invariant, so this
    * only APPROXIMATELY preserves the standard SRP collision
    * probability 1-θ/π (which assumes gaussian planes) — bucket
    * recall can differ slightly from the gaussian default mode;
    * precision is unaffected because the downstream cosine-threshold
    * verify filters every candidate pair. The bucket is a '1'/'0'
    * string, one char per plane (dot > 0 → '1'). */
  def hyperplaneBucketMd5(emb: Column, dim: Int, planes: Int,
      prefix: String = "plane"): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(p: Int, i: Int): Double = {
      val h = md.digest(
        s"$prefix:$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex digits = first 4 bytes, MSB-first, as unsigned
      val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      v.toDouble / 4294967296.0 * 2.0 - 1.0
    }
    val planeVecs: Array[Array[Double]] =
      Array.tabulate(planes)(p => Array.tabulate(dim)(i => u(p, i)))
    val f = udf { (a: Seq[Float]) =>
      if (a == null) null
      else {
        val sb = new Array[Char](planeVecs.length)
        var p = 0
        while (p < planeVecs.length) {
          val plane = planeVecs(p)
          var dot = 0.0; var i = 0
          val n = math.min(a.length, plane.length)
          while (i < n) { dot += a(i) * plane(i); i += 1 }
          sb(p) = if (dot > 0) '1' else '0'
          p += 1
        }
        new String(sb)
      }
    }
    f(emb)
  }

  // --- language ID (n-gram/stopword heuristic over common words) ---
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it",
      "for", "with", "was", "are", "this", "have"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los",
      "del", "se", "las", "por", "con", "para"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du",
      "une", "que", "est", "pour", "qui", "dans"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "den", "mit",
      "ist", "des", "im", "nicht", "ein", "eine", "auf"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "他", "有", "这",
      "中", "大", "来", "上", "国", "个"))

  /** Heuristic language ID: argmax over per-language stopword hit
    * ratios; "und" (undetermined) when no marker hits. */
  def languageId(text: Column): Column = languageId(text, tokens(text))

  /** Variant taking a pre-materialized token column (avoids inlining
    * the tokenizer expression once per language). */
  def languageId(text: Column, toks: Column): Column = {
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(array_intersect(toks, array(words.map(lit): _*)))
      // zh has no space-tokens: count marker chars in raw text instead
      val score =
        if (lang == "zh")
          words.map(w => size(split(text, w, -1)) - 1)
            .reduce[Column](_ + _)
        else hits
      struct(score.cast(DoubleType).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Quality score in [0,1]: blend of length, alpha ratio, stopword
    * ratio, mean word length sanity, repetition (distinct ratio). */
  def qualityScore(text: Column): Column = qualityScore(text, tokens(text))

  def qualityScore(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast(DoubleType)
    val lenScore = least(nTok / lit(20.0d), lit(1.0d))
    val alphaRatio =
      length(regexp_replace(text, "[^\\p{L}\\s]", "")).cast(DoubleType) /
        greatest(length(text).cast(DoubleType), lit(1.0d))
    val distinctRatio =
      size(array_distinct(toks)).cast(DoubleType) /
        greatest(nTok, lit(1.0d))
    val en = langMarkers.values.flatten.toSeq.distinct
    val stopRatio =
      size(array_intersect(toks, array(en.map(lit): _*))).cast(DoubleType) /
        greatest(nTok, lit(1.0d))
    val stopScore = least(stopRatio * lit(5.0d), lit(1.0d))
    round(lenScore * lit(0.3d) + alphaRatio * lit(0.3d) +
      distinctRatio * lit(0.2d) + stopScore * lit(0.2d), 6)
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-piece regex segments + digits +
    * punctuation each count as a token (GPT-2-style pre-tokenizer
    * approximation). */
  def tokenCountBpe(text: Column): Column =
    size(filter(split(text,
      """(?U)(?<=\s)|(?=\s)|(?<=[\p{P}])|(?=[\p{P}])"""),
      t => trim(t) =!= "")) +
      (length(text) / lit(8)).cast(IntegerType) // long-word split approx

  /** Fraction of word n-grams occupied by the single most frequent
    * n-gram — the Gopher-style "top n-gram fraction" repetition
    * signal. Docs with fewer than two n-grams score 0.0 (a single
    * gram is trivially "most frequent"). Tight-loop UDF: frequency
    * counting inside an array is imperative work (a HOF chain would
    * re-tokenize per gram — see the CollapseProject note above). */
  def topGramFracUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) 0.0
      else {
        val toks = wordTokens(s)
        val total = toks.length - n + 1
        if (total < 2) 0.0
        else {
          val m = new java.util.HashMap[String, Int]()
          var i = 0
          var best = 0
          while (i < total) {
            var j = 1
            val sb = new java.lang.StringBuilder(toks(i))
            while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
            val c = m.merge(sb.toString, 1, Integer.sum(_, _))
            if (c > best) best = c
            i += 1
          }
          best.toDouble / total
        }
      }
    }

  /** Non-empty lines of a document (for duplicate-line repetition
    * signals). The filter lambda touches only its element, so the
    * split child is evaluated once per row (no CollapseProject
    * re-evaluation hazard — that needs an upstream expr INSIDE the
    * lambda body). */
  def docLines(text: Column): Column =
    filter(split(text, "\n"), l => l =!= "")

  /** 1 - distinct/total over an array column; 0.0 for 0/1 elements. */
  def dupFrac(arr: Column): Column =
    when(size(arr) <= 1, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(arr)).cast(DoubleType) /
        size(arr).cast(DoubleType))

  /** Document fingerprint: stable 64-bit content hash of normalized
    * text (case/whitespace/punct-insensitive). Single regex pass:
    * the tokenizer's split+filter+join over the same pattern produces
    * exactly trim() of the collapsed string (runs of separators become
    * one space), so this is equivalent to
    * `xxhash64(concat_ws(" ", tokens(text)))` at a fraction of the
    * per-row cost. */
  def fingerprint(text: Column): Column =
    xxhash64(trim(lower(regexp_replace(text, "[^\\p{L}\\p{Nd}']+", " "))))

  /** 64-bit hashes of every length-`spanTokens` consecutive token run
    * (stride `stride`) — the span inventory for duplicated-substring
    * detection (Lee et al. 2021, arXiv:2107.06499, adapted from
    * suffix arrays to hashed fixed-length spans so it distributes).
    *
    * One tight JVM pass per doc: tokenize, then hash each span's
    * joined string once — no explode of the token array (the
    * generate-then-slice form copies the whole token array per span
    * row: O(len²) bytes at stride 1) and no HOF lambda (interpreted +
    * CollapseProject re-inlines the tokenizer per element; see the
    * signature-UDF note above). Tokenization is whitespace-class
    * split, case-SENSITIVE (exact-substring semantics), and
    * deliberately RE2-reproducible so a SQL oracle can rebuild the
    * exact span strings: `split('[ \t\n\f\r]+')`, empties dropped.
    * Docs with fewer than `spanTokens` tokens yield an empty span
    * inventory (never flagged). Null text → null. */
  def spanHashesUdf(spanTokens: Int, stride: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        val toks = s.split("[ \t\n\f\r]+").filter(_.nonEmpty)
        if (toks.length < spanTokens) Seq.empty[Long]
        else {
          val n = (toks.length - spanTokens) / stride + 1
          val sb = new java.lang.StringBuilder
          val out = new Array[Long](n)
          var i = 0
          while (i < n) {
            sb.setLength(0)
            var j = i * stride
            val end = j + spanTokens
            while (j < end) {
              if (j > i * stride) sb.append(' ')
              sb.append(toks(j))
              j += 1
            }
            out(i) = xxh64(sb.toString)
            i += 1
          }
          out.toSeq
        }
      }
    }
}
