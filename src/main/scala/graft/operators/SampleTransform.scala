package graft.operators

import graft.Pipeline.ModuleCfg
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `sample` transform — deterministic, reproducible down-sampling for
  * large-scale training-data pipelines.
  *
  * Sampling is HASH-based, not `rand(seed)`-based, on purpose:
  *  - re-runs (and partial re-runs after failures) select the SAME
  *    rows, so downstream caches/joins stay consistent;
  *  - the decision is a pure function of the row key, independent of
  *    partitioning — `rand(seed)` changes its row assignment whenever
  *    the partition layout changes, which at 100 TB it always does;
  *  - any other engine (or a DuckDB oracle) can replicate the exact
  *    sample from the same key column.
  *
  * A row is kept when the first 8 hex chars of md5(key) — an unbiased
  * uniform 32-bit value — fall below `fraction * 2^32`. Equal-length
  * lowercase-hex strings compare lexicographically exactly like the
  * numbers they encode, so the predicate is a plain string compare:
  * codegen'd, zero shuffle, pushdown-friendly.
  *
  * Parameters:
  *  - `keyFields`: columns forming the sampling key (joined with '#',
  *    nulls → ""); `keyField` accepted as the singular form.
  *  - `fraction`: global keep rate in [0,1].
  *  - `stratifyField` + `rates: {value: rate, ...}`: per-stratum keep
  *    rates (e.g. down-sample English, keep all of a rare language);
  *    strata not listed fall back to `fraction` (default 1.0 — keep).
  *  - `salt`: optional string mixed into the key so independent
  *    samples over the same corpus are uncorrelated.
  *  - `k` (+ optional `weightField`, `groupFields`): deterministic
  *    RESERVOIR mode — exactly k rows globally or per stratum,
  *    weight-proportional via Efraimidis–Spirakis u^(1/w) keys
  *    (gate q99); null/non-positive weights are never sampled.
  */
object SampleTransform {

  /** fraction → 8-hex-char threshold string ("33333333" for 0.2);
    * shared with the select `split` func so both encode thresholds
    * identically. */
  private[graft] def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"sample fraction must be in [0,1], got $fraction")
    val t = (fraction * 4294967296.0).toLong
    if (t >= 0xFFFFFFFFL) "g" // sorts after every hex digit → keep all
    else f"$t%08x"
  }

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    import graft.config.Json._
    val df = TransformCommon.single(cfg, inputs)
    val p = cfg.params
    val keyFields = {
      val ks = p.strArr("keyFields") ++ p.str("keyField")
      require(ks.nonEmpty, "sample: keyFields is required")
      ks
    }
    val salt = p.str("salt")
    val keyParts = salt.map(s => lit(s) :: Nil).getOrElse(Nil) ++
      keyFields.map(f => coalesce(col(f).cast("string"), lit("")))
    val bucket = substring(md5(concat_ws("#", keyParts: _*)), 1, 8)
    // `k` switches to DETERMINISTIC RESERVOIR mode — exactly k rows
    // (globally, or per groupFields stratum), optionally
    // weight-proportional via the Efraimidis–Spirakis exponential
    // key: rank by u^(1/w) descending, where u is the md5-uniform of
    // the row key, and keep the top k. Same reproducibility contract
    // as fraction mode (pure function of the key, any engine
    // replays it); rows with null or non-positive weight are never
    // sampled. Global k compiles to TakeOrderedAndProject (no
    // single-partition funnel); per-group k is one shuffle on the
    // stratum key.
    p.int("k") match {
      case Some(k) =>
        // fraction mode streams fine (a pure per-row key filter);
        // reservoir mode is a global/per-stratum top-k no stream can
        // finish — reject loudly instead of the opaque sink-start
        // "Sorting is not supported on streaming" error
        TransformCommon.requireBatch(df, "sample",
          s"${cfg.name} (reservoir mode)",
          "exactly-k selection ranks the complete input, which a " +
            "stream never finishes",
          "Use fraction mode (rate) on streams — a pure per-row " +
            "md5-key filter — or window the stream upstream and " +
            "reservoir-sample each window's batch output.")
        require(k > 0, s"sample: k must be positive, got $k")
        val w = p.str("weightField")
          .map(col(_).cast("double")).getOrElse(lit(1.0))
        val u = (conv(bucket, 16, 10).cast("double") + lit(1.0)) /
          lit(4294967297.0) // (int+1) / (2^32+1): u in (0,1), never 0
        val skey = pow(u, lit(1.0) / w)
        val groups = p.strArr("groupFields")
        val positive = df.filter(w.isNotNull && w > 0)
        // duplicate keyFields values tie on (skey, bucket); the shared
        // full-row hash keeps the selected PHYSICAL rows deterministic
        // across runs (rows still tied are bit-identical)
        val tie = TransformCommon.rowTie(df)
        val out =
          if (groups.isEmpty)
            positive.sort(skey.desc, bucket.asc, tie.asc).limit(k)
          else {
            val win = org.apache.spark.sql.expressions.Window
              .partitionBy(groups.map(col): _*)
              .orderBy(skey.desc, bucket.asc, tie.asc)
            positive.withColumn("__rk", row_number().over(win))
              .filter(col("__rk") <= k).drop("__rk")
          }
        return TransformCommon.finishRouted(out, cfg)
      case None => ()
    }
    val defaultFraction = p.dbl("fraction").getOrElse(1.0)
    val threshold: Column = p("rates") match {
      case Some(rates) if rates.names.nonEmpty =>
        val strat = p.str("stratifyField").getOrElse(
          throw new IllegalArgumentException(
            "sample: rates requires stratifyField"))
        rates.names.foldLeft(lit(thresholdHex(defaultFraction))) {
          (acc, value) =>
            when(col(strat).cast("string") === lit(value),
              lit(thresholdHex(rates.dbl(value).get))).otherwise(acc)
        }
      case _ => lit(thresholdHex(defaultFraction))
    }
    TransformCommon.finishRouted(df.filter(bucket < threshold), cfg)
  }
}
