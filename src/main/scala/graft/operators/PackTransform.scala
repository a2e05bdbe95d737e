package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `pack` transform — greedy sequence packing for LLM training data:
  * assign documents to fixed token-budget training sequences (context
  * windows) so short docs share a window instead of wasting pad
  * tokens.
  *
  * Packing is per-partition sequential greedy (close the current
  * sequence when the next doc would overflow the budget) — the
  * standard scale shape: each task packs its own partition with O(1)
  * state and zero shuffle or coordination; sequence ids are made
  * globally unique with the partition id. A corpus-global optimal
  * bin-packing would serialize the whole corpus through one
  * scheduler, for a few percent fill improvement. Fill efficiency on
  * shuffled corpora approaches the first-fit bound regardless of
  * partition count.
  *
  * Token counts come from `countField` (a precomputed column, e.g.
  * textAnalysis `n_tokens`) or a whitespace tokenization of `field`.
  * A doc alone exceeding the budget gets its own sequence (flagged
  * `__oversize`) — truncation is a tokenizer decision, not a packing
  * one.
  *
  * Output = input rows + `__tokens`, `__sequence_id` (partition-seq),
  * `__seq_pos` (doc's position in its sequence), `__oversize`.
  * Downstream materializes sequences with groupBy(__sequence_id).
  */
object PackTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val df = TransformCommon.single(cfg, inputs)
    val p = cfg.params
    val budget = p.long("tokenBudget").getOrElse(2048L)
    // NOT an opaque-crash guard: a stream would RUN here, but
    // sequence ids are partition-local ("$pid-$seq"), so two
    // micro-batches silently reuse the same id and a downstream
    // materialize merges unrelated docs past the token budget
    TransformCommon.requireBatch(df, "pack", cfg.name,
      "sequence ids are partition-local and would collide across "
        + "micro-batches, silently merging unrelated documents",
      "Stage the stream to storage and pack in a batch stage, or "
        + "window the stream upstream and pack each window's batch "
        + "output.")
    require(budget > 0, s"pack: tokenBudget must be positive, got $budget")
    val field = p.str("field").getOrElse("text")
    val counted = p.str("countField") match {
      case Some(c) => df.withColumn("__tokens", col(c).cast(LongType))
      case None => df.withColumn("__tokens",
        when(length(trim(col(field))) === 0, 0L)
          .otherwise(size(split(trim(col(field)), "\\s+")).cast(LongType)))
    }
    val outSchema = counted.schema
      .add("__sequence_id", StringType)
      .add("__seq_pos", IntegerType)
      .add("__oversize", BooleanType)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val tokIdx = counted.schema.fieldNames.indexOf("__tokens")
    val packed = counted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var seq = 0L
      var pos = 0
      var used = 0L
      it.map { row =>
        val t = math.max(if (row.isNullAt(tokIdx)) 0L
          else row.getLong(tokIdx), 1L)
        if (used > 0 && used + t > budget) {
          seq += 1; pos = 0; used = 0L
        }
        used += t
        val out = Row.fromSeq(row.toSeq :+ s"$pid-$seq" :+ pos :+
          (t > budget))
        pos += 1
        out
      }
    }(enc)
    // materialize: one row per training sequence — documents joined
    // in pack order by `separator` (null text joins as "", so every
    // charged doc occupies its slot) — instead of tagged input rows;
    // `__tokens` keeps the budget accounting (each doc >= 1),
    // `__raw_tokens` the raw whitespace count. Note a separator with
    // non-whitespace tokens adds n_docs-1 tokens the accounting
    // deliberately ignores (it charges documents, not glue). One
    // shuffle on the sequence id; sequences are partition-local so
    // groups are small and skew-free by construction.
    if (p.bool("materialize").getOrElse(false)) {
      val sep = p.str("separator").getOrElse("\n\n")
      val out = packed.groupBy(col("__sequence_id"))
        .agg(
          array_join(transform(array_sort(collect_list(struct(
            col("__seq_pos"),
            coalesce(col(field).cast(StringType), lit(""))
              .as("__t")))),
            s => s.getField("__t")), sep).as(field),
          sum(greatest(col("__tokens"), lit(1L))).as("__tokens"),
          sum(col("__tokens")).as("__raw_tokens"),
          count(lit(1)).cast(IntegerType).as("__n_docs"),
          max(col("__oversize")).as("__oversize"))
      return TransformCommon.finishRouted(out, cfg)
    }
    TransformCommon.finishRouted(packed, cfg)
  }
}
