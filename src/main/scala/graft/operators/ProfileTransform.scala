package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `profile` transform — one-pass column profiling for data-quality
  * gates over curation pipelines (parity-plus: the reference's
  * `compare` diffs two frames; the pipeline-level need before
  * training is profiling ONE frame — null rates, cardinalities,
  * ranges, moments — to assert corpus health and catch schema drift).
  *
  * Output: one row per profiled column — `column`, `n` (frame rows),
  * `nulls`, `distincts`, `min_s`/`max_s` (string-rendered bounds),
  * `mean`/`std` (sample stddev; null for non-numerics). Profiled
  * columns default to every ATOMIC column (arrays/maps/structs are
  * skipped — they have no total order); narrow with `fields`.
  *
  * `percentiles: [0.5, 0.95]` adds one `p50`/`p95`/... column per
  * fraction (null for non-numerics), computed from a KLL sketch per
  * numeric column IN THE SAME single pass — fixed-size mergeable
  * state, so the pass stays one narrow shuffle at any scale. `kllK`
  * (default 2048) sizes the sketches: quantiles are EXACT while the
  * non-null count stays ≤ kllK, and carry the published ~1.65/√k
  * normalized rank error beyond.
  *
  * Scale shape: ONE aggregation pass over the frame; the single
  * result row collects driver-side (bounded: one value per stat per
  * column) and melts into per-column rows. Exact `distincts` is the
  * default at gate scale but costs one Expand per column at 100 TB —
  * set `approx: true` to swap in approx_count_distinct (HLL, one
  * pass, no Expand), the same exact/approx twin pattern as the
  * aggregation module's count_distinct. */
object ProfileTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val df = TransformCommon.single(cfg, inputs)
    val p = cfg.params
    require(!df.isStreaming,
      s"profile ${cfg.name}: profiling is a batch action (a stream " +
        "has no final statistics) — profile a windowed aggregate " +
        "instead")
    def atomic(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }
    val declared = p.strArr("fields")
    declared.foreach(f => require(df.columns.contains(f),
      s"profile ${cfg.name}: field $f not in input " +
        s"(${df.columns.mkString(", ")})"))
    val cols =
      if (declared.nonEmpty) {
        declared.foreach(f => require(atomic(df.schema(f).dataType),
          s"profile ${cfg.name}: $f is non-atomic " +
            s"(${df.schema(f).dataType.simpleString}) — no total order"))
        declared
      } else df.schema.fields.filter(f => atomic(f.dataType))
        .map(_.name).toSeq
    require(cols.nonEmpty, s"profile ${cfg.name}: no atomic columns")
    val approx = p.bool("approx").getOrElse(false)
    val fractions = p.arrOf("percentiles").map(_.asDouble)
    fractions.foreach(f => require(f > 0.0 && f < 1.0,
      s"profile ${cfg.name}: percentile $f out of (0, 1)"))
    // duplicate fractions (e.g. [0.5, 0.50]) would emit duplicate
    // output column names — an ambiguous frame that breaks only at
    // downstream select time; fail here with the offenders named
    require(fractions.distinct.size == fractions.size,
      s"profile ${cfg.name}: duplicate percentiles " +
        fractions.groupBy(identity).collect {
          case (v, vs) if vs.size > 1 => v }.mkString("[", ", ", "]"))
    val kllK = p.int("kllK").getOrElse(2048)
    def numeric(n: String): Boolean =
      df.schema(n).dataType.isInstanceOf[NumericType]
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
        val base = Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
          (if (approx) approx_count_distinct(col(c))
           else count_distinct(col(c))).as(s"__d_$c"),
          min(col(c)).cast(StringType).as(s"__min_$c"),
          max(col(c)).cast(StringType).as(s"__max_$c"))
        if (numeric(c)) base ++ Seq(
          avg(col(c).cast(DoubleType)).as(s"__mean_$c"),
          stddev(col(c).cast(DoubleType)).as(s"__std_$c")) ++
          (if (fractions.nonEmpty)
            Seq(graft.functions.KllFunctions.kllSketch(kllK,
              col(c).cast(DoubleType)).as(s"__kll_$c"))
          else Nil)
        else base
      }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    // decode the per-column quantiles from the one collected stat row
    // (driver-side: one bounded binary sketch per numeric column)
    def quantiles(c: String): Seq[java.lang.Double] =
      if (!numeric(c) || fractions.isEmpty)
        fractions.map(_ => null: java.lang.Double)
      else {
        val bytes = r.getAs[Array[Byte]](s"__kll_$c")
        if (bytes == null) fractions.map(_ => null: java.lang.Double)
        else {
          val sk = org.apache.datasketches.kll.KllDoublesSketch
            .heapify(org.apache.datasketches.memory.Memory.wrap(bytes))
          if (sk.isEmpty) fractions.map(_ => null: java.lang.Double)
          else fractions.map(f =>
            java.lang.Double.valueOf(sk.getQuantile(f)))
        }
      }
    def opt[T](name: String): Option[T] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getAs[T](i))
    }
    val n = r.getAs[Long]("__n")
    val rows = cols.map { c =>
      Row.fromSeq(Seq(c, n,
        r.getAs[Long](s"__nulls_$c"),
        r.getAs[Long](s"__d_$c"),
        opt[String](s"__min_$c").orNull,
        opt[String](s"__max_$c").orNull,
        if (numeric(c)) opt[Double](s"__mean_$c")
          .map(java.lang.Double.valueOf).orNull
        else null,
        if (numeric(c)) opt[Double](s"__std_$c")
          .map(java.lang.Double.valueOf).orNull
        else null) ++ quantiles(c))
    }
    // p50, p95, p99_9 — percent value with "." → "_"
    // decimal-string arithmetic: 0.95 * 100 in doubles is
    // 94.99999999999999, which would name the column p94_9...9
    def pName(f: Double): String = "p" + (BigDecimal(f.toString) * 100)
      .underlying.stripTrailingZeros.toPlainString.replace(".", "_")
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("nulls", LongType, nullable = false),
      StructField("distincts", LongType, nullable = false),
      StructField("min_s", StringType),
      StructField("max_s", StringType),
      StructField("mean", DoubleType),
      StructField("std", DoubleType)) ++
      fractions.map(f => StructField(pName(f), DoubleType)))
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    TransformCommon.finishRouted(out, cfg)
  }
}
