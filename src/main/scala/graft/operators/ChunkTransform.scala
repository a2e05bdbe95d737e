package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  */
object ChunkTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val df = TransformCommon.single(cfg, inputs)
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
    val reservedHit = Seq("__ci", "__piece").filter(df.columns.contains)
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
    // a null document has no tokens and yields NO chunks: the pieces
    // array stays null and the (non-outer) posexplode drops the row —
    // without this guard size(null)= -1 made nChunks hit the `<= sz`
    // branch and emit one phantom row with a null chunk
    val pieces = when(srcCol.isNotNull,
      transform(sequence(lit(0), nChunks - 1),
        i => struct(
          (i * stride).as("off"),
          // text mode re-joins the window; token mode emits the raw
          // token-array slice (downstream packs/embeds tokens)
          (if (tokensField.isDefined) slice(toks, i * stride + 1, lit(sz))
           else array_join(slice(toks, i * stride + 1, lit(sz)), " "))
            .as("txt"))))
    val keep = df.columns.map(col).toSeq
    val out = df
      .select(keep :+ posexplode(pieces).as(Seq("__ci", "__piece")): _*)
      .select(keep ++ Seq(
        col("__piece.txt").as(chunkField),
        col("__ci").cast(LongType).as(indexField),
        col("__piece.off").cast(LongType).as(offsetField)): _*)
    TransformCommon.finishRouted(out, cfg)
  }
}
