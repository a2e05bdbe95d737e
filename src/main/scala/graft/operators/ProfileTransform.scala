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
    if (p.str("baselineInput").isDefined)
      return drift(spark, cfg, inputs, df)
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

  /** DRIFT profile (`baselineInput`): per-column distribution drift
    * between a baseline snapshot and the current frame — the
    * before-training corpus-drift gate ("did this month's crawl
    * shift?"). Per profiled column: row/null counts and null-rate
    * delta on both sides, plus PSI (population stability index) —
    * for numeric columns over `psiBuckets` (default 10) equi-width
    * buckets anchored on the BASELINE's [min, max] (out-of-range
    * current values clamp into the edge buckets, so new mass
    * outside the baseline's support registers as drift instead of
    * vanishing), for categorical columns over the baseline's top
    * `psiCategories` (default 20) values (count desc, value asc —
    * a total order) plus one other-bucket that both bounds the
    * histogram under unbounded vocabularies and catches NEW
    * categories. Numeric columns additionally report the mean
    * delta. Proportions are Laplace-smoothed
    * ((count + 0.5) / (n + 0.5·B)) so empty buckets stay finite;
    * the usual reading is psi < 0.1 stable, 0.1–0.25 moderate,
    * > 0.25 shifted.
    *
    * Scale shape: two aggregation passes per frame (moments+edges,
    * then the bucket histogram — the histogram needs the baseline
    * edges first), each ONE narrow pass with fixed-size state
    * (B conditional sums per column); the four stat rows collect
    * driver-side (bounded: B longs per numeric column) and the psi
    * fold runs on the driver. Nothing row-shaped ever shuffles. */
  private def drift(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame], cur: DataFrame)
      : Map[String, DataFrame] = {
    val p = cfg.params
    val bn = p.str("baselineInput").get
    require(cfg.inputs.contains(bn),
      s"profile ${cfg.name}: baselineInput $bn must be listed in " +
        s"inputs (${cfg.inputs.mkString(", ")})")
    require(cfg.inputs.head != bn,
      s"profile ${cfg.name}: baselineInput is the FIRST input — " +
        "name a different input as the baseline")
    val base = inputs(bn)
    require(!base.isStreaming,
      s"profile ${cfg.name}: drift profiling is a batch action")
    def atomic(dt: DataType): Boolean = dt match {
      case _: ArrayType | _: MapType | _: StructType => false
      case _ => true
    }
    val declared = p.strArr("fields")
    declared.foreach { f =>
      require(cur.columns.contains(f) && base.columns.contains(f),
        s"profile ${cfg.name}: field $f not in both inputs")
      require(atomic(cur.schema(f).dataType) &&
        atomic(base.schema(f).dataType),
        s"profile ${cfg.name}: $f is non-atomic — no drift order")
    }
    val cols =
      if (declared.nonEmpty) declared
      else cur.schema.fields.filter(f => atomic(f.dataType))
        .map(_.name).filter(base.columns.contains).toSeq
    require(cols.nonEmpty,
      s"profile ${cfg.name}: no shared atomic columns to drift-check")
    val buckets = p.int("psiBuckets").getOrElse(10)
    require(buckets >= 2 && buckets <= 1000,
      s"profile ${cfg.name}: psiBuckets must be in [2, 1000]")
    // approx: true swaps the numeric bucketing from equi-width
    // [min, max] buckets to BASELINE QUANTILE buckets read off a KLL
    // sketch (one extra aggregate in the same baseline pass,
    // fixed-size mergeable state). This is the 100 TB shape twice
    // over: the sketch is shard-mergeable (a persisted per-shard
    // sketch family can stand in for rescanning the baseline), and
    // quantile buckets are robust to heavy tails (one outlier
    // stretches an equi-width grid until all mass lands in one
    // bucket; quantile edges keep every bucket populated). Exact
    // while the baseline column has ≤ kllK values (the sketch
    // retains everything), published ~1.65/√k rank error past it.
    val approxPsi = p.bool("approx").getOrElse(false)
    val kllK = p.int("kllK").getOrElse(200)
    require(kllK >= 8 && kllK <= 65535,
      s"profile ${cfg.name}: kllK must be in [8, 65535]")
    def numeric(df: DataFrame, c: String): Boolean =
      df.schema(c).dataType.isInstanceOf[NumericType]
    val numCols = cols.filter(c => numeric(cur, c) && numeric(base, c))
    // categorical psi: non-numeric columns bucket by the baseline's
    // top-`psiCategories` values (count desc, value asc — a total
    // order) plus one "other" bucket for everything else, so an
    // unbounded vocabulary still yields a fixed-size histogram and
    // NEW categories register as drift in the other-bucket
    val catK = p.int("psiCategories").getOrElse(20)
    require(catK >= 1 && catK <= 10000,
      s"profile ${cfg.name}: psiCategories must be in [1, 10000]")
    val catCols = cols.filterNot(numCols.contains)
    val catsOf: Map[String, Seq[String]] =
      if (catCols.nonEmpty && approxPsi) {
        // approx: ONE frequent-items pass for ALL categorical
        // columns (Spark's approx_top_k — SpaceSaving-style
        // fixed-size state, exact within maxItemsTracked) instead of
        // a vocabulary-sized groupBy per column — under an unbounded
        // vocabulary at 100 TB the sketch is the only fixed-state
        // way to pick the baseline buckets. Re-sorted (count desc,
        // value asc) for the exact twin's deterministic bucket
        // indexing; ties AT the top-K boundary follow the sketch's
        // selection (identical in the exact regime when the
        // vocabulary fits in K).
        val maxTracked = p.int("maxItemsTracked").getOrElse(10000)
        val aggs = catCols.map(c => call_function("approx_top_k",
          col(c).cast(StringType), lit(catK), lit(maxTracked))
          .as(s"__tk_$c"))
        val row = base.agg(aggs.head, aggs.tail: _*).head()
        catCols.map { c =>
          c -> row.getSeq[Row](row.fieldIndex(s"__tk_$c"))
            .map(r => (r.getAs[String]("item"), r.getAs[Long]("count")))
            .sortBy { case (v, n) => (-n, v) }
            .map(_._1).toSeq
        }.toMap
      } else catCols.map { c =>
        // exact: one vocabulary-sized groupBy per categorical
        // column; the collected top-K is bounded by psiCategories
        c -> base.filter(col(c).isNotNull)
          .groupBy(col(c).cast(StringType).as("__v"))
          .agg(count(lit(1)).as("__c"))
          .orderBy(col("__c").desc, col("__v").asc)
          .limit(catK)
          .collect().map(_.getString(0)).toSeq
      }.toMap

    // pass 1 (each side): counts, null counts, mean, baseline edges
    // (plus, under approx, one KLL sketch per numeric column — same
    // single pass, fixed-size state)
    def moments(df: DataFrame, withSketches: Boolean): Row = {
      val aggs = Seq(count(lit(1)).as("__n")) ++ cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")) ++
        numCols.flatMap { c =>
          val v = col(c).cast(DoubleType)
          Seq(avg(v).as(s"__mean_$c"),
            min(v).as(s"__min_$c"), max(v).as(s"__max_$c"))
        } ++ (if (!withSketches) Nil else numCols.map { c =>
          val v = col(c).cast(DoubleType)
          graft.functions.KllFunctions
            .kllSketch(kllK, when(!isnan(v), v)).as(s"__kll_$c")
        })
      df.agg(aggs.head, aggs.tail: _*).head()
    }
    val bRow = moments(base, approxPsi)
    val cRow = moments(cur, withSketches = false)
    def optD(r: Row, name: String): Option[Double] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    // baseline-anchored bucket edges; a column that is all-null (no
    // edges) or constant-support gets the degenerate two-sided
    // bucketing (== min → bucket 0, else the top bucket)
    val edges: Map[String, (Double, Double)] = numCols.flatMap { c =>
      for (mn <- optD(bRow, s"__min_$c"); mx <- optD(bRow, s"__max_$c"))
        yield c -> (mn, mx)
    }.toMap
    // approx: baseline quantile edges at i/B, i = 1..B-1 — bucket(v)
    // = |{edges e : v > e}|, a total assignment with no clamping
    // (duplicate edges under skew just leave buckets empty, which
    // the Laplace smoothing keeps finite)
    val qEdges: Map[String, Seq[Double]] =
      if (!approxPsi) Map.empty
      else numCols.flatMap { c =>
        graft.functions.KllFunctions
          .quantilesAt(bRow.getAs[Array[Byte]](s"__kll_$c"),
            (1 until buckets).map(_.toDouble / buckets))
          .map(c -> _)
      }.toMap
    val histCols =
      if (approxPsi) numCols.filter(qEdges.contains)
      else numCols.filter(edges.contains)

    // bucket count per column: numeric → psiBuckets; categorical →
    // top-K categories + the other-bucket
    def bucketsOf(c: String): Int =
      if (numCols.contains(c)) buckets else catsOf(c).size + 1

    // pass 2 (each side): fixed conditional sums per column
    def hist(df: DataFrame): Option[Row] = {
      val numAggs = histCols.flatMap { c =>
        val v = col(c).cast(DoubleType)
        val b =
          if (approxPsi)
            qEdges(c).foldLeft(lit(0L): org.apache.spark.sql.Column) {
              (acc, e) => acc + when(v > lit(e), 1L).otherwise(0L)
            }
          else {
            val (mn, mx) = edges(c)
            if (mx > mn)
              least(greatest(
                floor((v - lit(mn)) / lit(mx - mn) * lit(buckets)),
                lit(0L)), lit(buckets - 1L))
            else when(v === lit(mn), lit(0L))
              .otherwise(lit(buckets - 1L))
          }
        (0 until buckets).map(i => sum(
          when(v.isNotNull && !isnan(v) && b === lit(i.toLong), 1L)
            .otherwise(0L)).as(s"__h${i}_$c"))
      }
      val catAggs = catCols.flatMap { c =>
        val cats = catsOf(c)
        val v = col(c).cast(StringType)
        val inCats =
          if (cats.isEmpty) lit(false) else v.isin(cats: _*)
        cats.zipWithIndex.map { case (cat, i) =>
          sum(when(v === lit(cat), 1L).otherwise(0L))
            .as(s"__h${i}_$c")
        } :+ sum(when(v.isNotNull && !inCats, 1L).otherwise(0L))
          .as(s"__h${cats.size}_$c")
      }
      val aggs = numAggs ++ catAggs
      if (aggs.isEmpty) None
      else Some(df.agg(aggs.head, aggs.tail: _*).head())
    }
    val bHist = hist(base)
    val cHist = hist(cur)
    def counts(r: Option[Row], c: String): Seq[Long] =
      // a numeric column with no baseline edges (all-null baseline)
      // has no histogram columns — psi degrades to null
      if (numCols.contains(c) && !histCols.contains(c)) Seq.empty
      else r.map(row => (0 until bucketsOf(c)).map(i =>
        row.getAs[Long](s"__h${i}_$c"))).getOrElse(Seq.empty)
    def psi(cb: Seq[Long], cc: Seq[Long]): java.lang.Double = {
      val nb = cb.sum.toDouble
      val nc = cc.sum.toDouble
      if (cb.isEmpty || nb == 0 || nc == 0) null
      else {
        val b = cb.length
        var s = 0.0
        var i = 0
        while (i < b) {
          val pi = (cb(i) + 0.5) / (nb + 0.5 * b)
          val qi = (cc(i) + 0.5) / (nc + 0.5 * b)
          s += (qi - pi) * math.log(qi / pi)
          i += 1
        }
        java.lang.Double.valueOf(s)
      }
    }
    val nB = bRow.getAs[Long]("__n")
    val nC = cRow.getAs[Long]("__n")
    val rows = cols.map { c =>
      val nulB = bRow.getAs[Long](s"__nulls_$c")
      val nulC = cRow.getAs[Long](s"__nulls_$c")
      val fracDelta: java.lang.Double =
        if (nB == 0 || nC == 0) null
        else java.lang.Double.valueOf(
          nulC.toDouble / nC - nulB.toDouble / nB)
      val isNum = numCols.contains(c)
      val meanB = if (isNum) optD(bRow, s"__mean_$c") else None
      val meanC = if (isNum) optD(cRow, s"__mean_$c") else None
      Row(c, nB, nC, nulB, nulC, fracDelta,
        meanB.map(java.lang.Double.valueOf).orNull,
        meanC.map(java.lang.Double.valueOf).orNull,
        (for (a <- meanB; b <- meanC)
          yield java.lang.Double.valueOf(b - a)).orNull,
        psi(counts(bHist, c), counts(cHist, c)))
    }
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("n_base", LongType, nullable = false),
      StructField("n_cur", LongType, nullable = false),
      StructField("nulls_base", LongType, nullable = false),
      StructField("nulls_cur", LongType, nullable = false),
      StructField("null_frac_delta", DoubleType),
      StructField("mean_base", DoubleType),
      StructField("mean_cur", DoubleType),
      StructField("mean_delta", DoubleType),
      StructField("psi", DoubleType)))
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    TransformCommon.finishRouted(out, cfg)
  }
}
