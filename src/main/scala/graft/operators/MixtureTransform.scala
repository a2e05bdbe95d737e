package graft.operators

import graft.Pipeline.ModuleCfg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `mixture` transform — weighted blending of multiple corpora into
  * one training mix (the "data mixing" stage of an LM pipeline: web
  * gets 0.5 epochs, code 1 epoch, a small high-quality set 2.5).
  *
  * Each input's weight is an EPOCH count: `floor(w)` full passes over
  * the input plus one hash-sampled pass at rate `w - floor(w)`. The
  * fractional pass reuses the `sample` module's md5-bucket predicate
  * (see [[SampleTransform.thresholdHex]]) keyed on
  * `salt#input#epoch#key`, so
  *  - re-runs select the same rows regardless of partition layout,
  *  - distinct epochs and distinct inputs draw uncorrelated samples,
  *  - any SQL engine replays the exact mix (the q67 DuckDB oracle is
  *    a UNION ALL of md5-filtered SELECTs).
  *
  * Scale shape: every leg is a map-side filter over its input's scan
  * (no shuffle anywhere — `explain` shows a Union of filtered scans),
  * so the mix costs one pass over each replicated epoch. Schemas are
  * aligned by name with missing columns null-filled, as the `union`
  * module does.
  *
  * Parameters:
  *  - `weights: {inputName: epochs, ...}` — epochs >= 0 per input
  *    (unlisted inputs default 1.0; 0 drops the input; cap 100).
  *  - `keyFields` / `keyField`: sampling-key columns for fractional
  *    epochs (required only when some weight is fractional).
  *  - `salt`: optional string decorrelating this mix from other
  *    samples over the same corpus.
  *  - `sourceField` / `epochField`: optional output columns tagging
  *    each row's origin input and epoch index (0-based) — set
  *    `epochField` when downstream steps must distinguish duplicated
  *    passes.
  *
  * No reference counterpart (mercari/pipeline has `union` +
  * per-input filters but no weighted-epoch semantics); modeled on the
  * mixing stage of public LM data pipelines (Dolma, RedPajama, T5).
  */
object MixtureTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    import graft.config.Json._
    require(cfg.inputs.nonEmpty, "mixture: at least one input is required")
    val p = cfg.params
    val weights = p("weights")
    val keyFields = p.strArr("keyFields") ++ p.str("keyField")
    val salt = p.str("salt")
    val sourceField = p.str("sourceField")
    val epochField = p.str("epochField")

    // STREAMING mixes are allowed when every leg is a single pass
    // (weight ≤ 1.0): the fractional filter is a stateless map-side
    // predicate and the union is a plain streaming union — the
    // weighted ingest-time blend. Multi-epoch replication (w > 1)
    // still needs a bounded corpus; and Spark cannot union a
    // streaming leg with a batch one, so modes must not mix.
    val anyStreaming = cfg.inputs.exists(n => inputs(n).isStreaming)
    if (anyStreaming) require(cfg.inputs.forall(n =>
        inputs(n).isStreaming),
      "mixture: inputs mix streaming and batch collections — a " +
        "union across modes is not plannable; read the batch side " +
        "as a stream too, or stage the streams to storage first")
    val legs = cfg.inputs.flatMap { name =>
      val in = inputs(name)
      val w = weights.flatMap(_.dbl(name)).getOrElse(1.0)
      require(w >= 0.0 && w <= 100.0,
        s"mixture: weight for '$name' must be in [0,100], got $w")
      require(!in.isStreaming || w <= 1.0,
        s"mixture: input '$name' is streaming with weight $w — " +
          "epoch replication (weight > 1) needs a bounded corpus; " +
          "stage the stream to storage and mix the stored table, or " +
          "use a weight ≤ 1.0 (a stateless sampled pass)")
      val full = math.floor(w).toInt
      val frac = w - full
      val epochs = full + (if (frac > 1e-9) 1 else 0)
      if (frac > 1e-9) require(keyFields.nonEmpty,
        s"mixture: weight $w for '$name' has a fractional epoch; " +
          "keyFields is required for deterministic sampling")
      (0 until epochs).map { e =>
        var df = in
        if (e == full) { // the single fractional pass, if any
          val keyParts = salt.map(lit(_)).toList ++
            List(lit(name), lit(e.toString)) ++
            keyFields.map(f => coalesce(col(f).cast("string"), lit("")))
          val bucket = substring(md5(concat_ws("#", keyParts: _*)), 1, 8)
          df = df.filter(bucket < lit(SampleTransform.thresholdHex(frac)))
        }
        sourceField.foreach(f => df = df.withColumn(f, lit(name)))
        epochField.foreach(f => df = df.withColumn(f, lit(e)))
        df
      }
    }
    require(legs.nonEmpty,
      "mixture: all input weights are 0 — nothing to mix")
    val out = legs.reduceLeft(_.unionByName(_, allowMissingColumns = true))
    TransformCommon.finishRouted(out, cfg)
  }
}
