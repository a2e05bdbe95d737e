package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `chunk` transform — sliding token-window document splitting for
  * LLM training/embedding prep (parity-plus: the reference has no
  * chunker; the prompt-level need is cutting long documents into
  * overlapping context-window pieces before embedding or packing).
  *
  * Each document's `field` splits on whitespace into tokens; chunks
  * cover token offsets `[i*stride, i*stride + size)` for
  * `i = 0 .. ceil((len - size) / stride)` (one chunk when
  * `len <= size`), `stride = size - overlap`. Output = input columns
  * plus the chunk text (`chunkField`), its 0-based ordinal
  * (`indexField`) and its first-token offset (`offsetField`).
  *
  * Pure Column arithmetic — `split` + `sequence` + `slice` +
  * `posexplode`, all codegen'd, zero shuffle, no UDF: the explode
  * multiplies rows map-side exactly like the reference's unnest
  * path, so the operator scales with input bytes regardless of
  * document count.
  *
  * Tokenizer-exact chunking: declare `tokensField` naming an
  * existing token ARRAY column (e.g. `tokenize` module output — any
  * analyzer chain, BPE included) and the windows slice that array
  * directly instead of whitespace-splitting `field`; the chunk
  * output column is then the token-array slice, offsets count
  * tokens of that tokenization. A null document (null text or null
  * token array) yields zero chunks.
  *
  * `mode: cdc` — CONTENT-DEFINED chunking (FastCDC-family): instead
  * of fixed strides, a chunk boundary falls after token `i` whenever
  * the rolling fingerprint of the last `window` tokens (seeded
  * xxhash64 of the per-token hash slice by default; `hashAlgo: md5`
  * = joined-window digest, SQL-replayable) lands below a
  * `1/2^bits` threshold —
  * expected chunk length 2^`bits` tokens, and boundaries move WITH
  * the content, so inserting a sentence near a document's head
  * shifts one chunk instead of re-cutting every downstream window
  * (the dedup-stable chunking property fixed strides lack; chunk
  * fingerprints then dedup across near-identical documents).
  * Deliberately pure content-defined: FastCDC's sequential min/max
  * clamps are skipped — size control is `bits` — which keeps the
  * operator a data-parallel Column program and the boundary rule
  * replayable by any SQL engine (the q116 oracle). `size`/`overlap`
  * do not apply in cdc mode.
  *
  * `mode: sentence` — one chunk per SENTENCE: maximal runs of
  * non-terminator characters plus their closing `[.!?]*` run,
  * trimmed, empties dropped (deliberately lookaround-free so any
  * RE2-class engine replays the boundary rule — the q123 oracle).
  * `offsetField` counts the tokens of the PRECEDING sentences (the
  * sentence tokenization's cumulative whitespace-token count, one
  * `aggregate` pass per document). Sentence-level dedup and
  * sentence→`pack` composition (greedy token-budget grouping of
  * sentences) are the downstream uses; `size`/`overlap`/
  * `tokensField` do not apply in sentence mode.
  */
object ChunkTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    // chunking is heavy per-row Column work (cdc: O(n·w) rolling
    // fingerprints — md5 digests per token position in audit mode;
    // sentence: regex segmentation + offset folds) and a sub-split
    // corpus file would serialize ALL of it onto one task (r21
    // measured q116's md5 cdc at 4.6 s, single-stage, one 580 KB
    // input split — the whole digest pass on one core of 32). widen
    // is stats-probed: inputs bigger than one split per core skip
    // the repartition, so this only fans out genuinely narrow scans.
    val df = TransformCommon.widen(TransformCommon.single(cfg, inputs))
    val p = cfg.params
    val field = p.str("field").getOrElse("text")
    val sz = p.int("size").getOrElse(512)
    val overlap = p.int("overlap").getOrElse(0)
    require(sz > 0, s"chunk ${cfg.name}: size must be positive")
    require(overlap >= 0 && overlap < sz,
      s"chunk ${cfg.name}: overlap must be in [0, size)")
    val stride = sz - overlap
    val chunkField = p.str("chunkField").getOrElse("chunk")
    val indexField = p.str("indexField").getOrElse("chunk_index")
    val offsetField = p.str("offsetField").getOrElse("chunk_offset")
    for (c <- Seq(chunkField, indexField, offsetField))
      require(!df.columns.contains(c),
        s"chunk ${cfg.name}: output column $c collides with an input " +
          "column — set chunkField/indexField/offsetField")
    val reservedHit = Seq("__ci", "__piece", "__cdc_starts", "__cdc_th",
      "__sents", "__soffs")
      .filter(df.columns.contains)
    require(reservedHit.isEmpty,
      s"chunk ${cfg.name}: input columns ${reservedHit.mkString(", ")} " +
        "collide with the operator's working names — rename them " +
        "upstream")
    val tokensField = p.str("tokensField")
    val srcCol = tokensField.map(col).getOrElse(col(field))
    tokensField.foreach { tf =>
      require(df.schema(tf).dataType
          .isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"chunk ${cfg.name}: tokensField $tf must be an array column " +
          "(tokenize module output)")
    }
    val toks = tokensField.map(col)
      .getOrElse(split(trim(col(field)), "\\s+"))
    val n = size(toks)
    // number of chunks: 1 while the doc fits, else enough strides to
    // cover the tail (the last chunk may be shorter than `size`)
    val nChunks = when(n <= lit(sz), lit(1))
      .otherwise(ceil((n - lit(sz)).cast(DoubleType) / lit(stride))
        .cast(IntegerType) + lit(1))
    def piece(off: Column, len: Column): Column = struct(
      off.as("off"),
      // text mode re-joins the window; token mode emits the raw
      // token-array slice (downstream packs/embeds tokens)
      (if (tokensField.isDefined) slice(toks, off + 1, len)
       else array_join(slice(toks, off + 1, len), " ")).as("txt"))
    val mode = p.str("mode").getOrElse("sliding")
    require(Set("sliding", "cdc", "sentence")(mode),
      s"chunk ${cfg.name}: mode $mode (valid: sliding, cdc, sentence)")
    require(mode != "sentence" || tokensField.isEmpty,
      s"chunk ${cfg.name}: sentence mode segments text — tokensField " +
        "does not apply (chunk the text, then tokenize downstream)")
    // a null document has no tokens and yields NO chunks: the pieces
    // array stays null and the (non-outer) posexplode drops the row —
    // without this guard size(null)= -1 made nChunks hit the `<= sz`
    // branch and emit one phantom row with a null chunk
    val (explodeSrc, pieces) =
      if (mode == "sliding")
        (df, when(srcCol.isNotNull,
          transform(sequence(lit(0), nChunks - 1),
            i => piece(i * stride, lit(sz)))))
      else if (mode == "sentence") {
        // the sentence array and its offsets each materialize in
        // their own projection: both are referenced by the per-chunk
        // lambda, and inlined they would re-run the segmentation (and
        // the O(n) offset fold) once PER SENTENCE — the same
        // CollapseProject hazard the cdc starts column hoists around
        val d1 = df.withColumn("__sents",
          filter(transform(
            regexp_extract_all(col(field),
              lit("[^.!?]+[.!?]*"), lit(0)),
            s => trim(s)), s => s =!= lit("")))
        val sents = col("__sents")
        // one aggregate pass folds (running token count, offsets):
        // offsets[j] = tokens of sentences 0..j-1
        val d2 = d1.withColumn("__soffs",
          aggregate(sents,
            struct(lit(0).as("run"),
              array().cast("array<int>").as("offs")),
            (acc, s) => struct(
              (acc.getField("run") + size(split(s, "\\s+")))
                .as("run"),
              concat(acc.getField("offs"),
                array(acc.getField("run"))).as("offs")),
            acc => acc.getField("offs")))
        val offs = col("__soffs")
        // the size guard matters: sequence(0, -1) DESCENDS in Spark,
        // so an all-punctuation/empty doc would emit phantom chunks
        (d2, when(col(field).isNotNull && size(sents) > 0,
          transform(sequence(lit(0), size(sents) - 1), j => struct(
            element_at(offs, j + 1).as("off"),
            element_at(sents, j + 1).as("txt")))))
      } else {
        val w = p.int("window").getOrElse(8)
        val bits = p.int("bits").getOrElse(5)
        require(w > 0 && bits >= 1 && bits <= 30,
          s"chunk ${cfg.name}: cdc needs window > 0 and bits in 1..30")
        val seed = p.str("seed").getOrElse("0")
        // default fingerprint path: hash every token ONCE (codegen'd
        // seeded xxhash64), then fingerprint each window as the hash
        // of its 8-long hash slice — per position that is a bounded
        // long-array hash instead of a string join + digest (the
        // string path measured 6x the sliding mode's cost at 100x).
        // `hashAlgo: md5` swaps in the joined-window md5 with the
        // hex-threshold compare the q116 oracle replays — the same
        // fast-default / md5-audit split as dedup and similarity.
        val md5Mode = p.str("hashAlgo").contains("md5")
        val thr = SampleTransform.thresholdHex(
          1.0 / (1L << bits).toDouble)
        val (hashed, bps) =
          if (md5Mode) {
            // element cast keeps md5 mode working over non-string
            // token arrays (BPE ids via tokensField); identity for
            // string tokens so the q116 oracle is unaffected
            val b = when(n - 1 >= w,
              filter(sequence(lit(w), n - 1), i =>
                substring(md5(concat_ws(" ", lit(seed), array_join(
                  transform(slice(toks, i - w + 1, lit(w)),
                    e => e.cast(StringType)), " "))), 1, 8) <
                  lit(thr)))
              .otherwise(array().cast("array<int>"))
            (df, b)
          } else {
            // token hashes materialize in their own projection (and
            // are referenced twice: size + slice) so the per-token
            // pass is not re-run per candidate position
            val d1 = df.withColumn("__cdc_th",
              transform(toks, t => xxhash64(lit(seed), t)))
            val th = col("__cdc_th")
            val b = when(size(th) - 1 >= w,
              filter(sequence(lit(w), size(th) - 1), i =>
                pmod(xxhash64(slice(th, i - w + 1, lit(w))),
                  lit(1L << bits)) === 0L))
              .otherwise(array().cast("array<int>"))
            (d1, b)
          }
        // candidate boundaries live at token positions [w, n-1]
        // (a boundary on the final token would cut an empty chunk).
        // The start-offsets column materializes in its OWN projection
        // before the per-chunk lambda references it: inlined into the
        // lambda, the whole boundary scan (an O(n·w) filter) would be
        // a free subtree re-evaluated per chunk element (the same
        // CollapseProject hazard the quantize funcs hoist around);
        // as a multi-referenced attribute it computes once per row
        val df0 = hashed.withColumn("__cdc_starts",
          concat(array(lit(0)), bps))
        val sc = col("__cdc_starts")
        (df0, when(srcCol.isNotNull,
          transform(sequence(lit(0), size(sc) - 1), j => {
            val st = element_at(sc, j + 1)
            val en = when(j + lit(2) <= size(sc),
              element_at(sc, j + 2)).otherwise(n)
            piece(st, en - st)
          })))
      }
    val keep = df.columns.map(col).toSeq
    val out = explodeSrc
      .select(keep :+ posexplode(pieces).as(Seq("__ci", "__piece")): _*)
      .select(keep ++ Seq(
        col("__piece.txt").as(chunkField),
        col("__ci").cast(LongType).as(indexField),
        col("__piece.off").cast(LongType).as(offsetField)): _*)
    TransformCommon.finishRouted(out, cfg)
  }
}
