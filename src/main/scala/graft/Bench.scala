package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{struct, sum, xxhash64}
object Bench {
  /** Forces evaluation of EVERY output column: under a bare count()
    * Catalyst prunes unreferenced projections, so select-heavy queries
    * would be benched as near-noops. Hashing struct("*") keeps the
    * full projection in the measured plan.
    */
  private def consume(df: DataFrame): Unit = {
    val cols = df.columns
    if (cols.isEmpty) { df.count(); () }
    else
      // xxhash64 rejects some types (e.g. map); fall back to a
      // full-width string hash rather than a pruned count
      try df.agg(sum(xxhash64(struct(cols.head, cols.tail: _*)))).collect()
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          df.agg(sum(xxhash64(df.columns.map(c =>
            org.apache.spark.sql.functions.col(c).cast("string")): _*))).collect()
      }
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated filter for local micro-benching; the
    // driver never sets it, so round benches always cover everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    // benchOnly: default-hash-mode twins of the md5 audit gates —
    // measured but not oracle-checked (their md5 twins verify)
    val selected = (SparkEntry.queries ++ SparkEntry.benchOnly)
      .toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Warm EVERY selected query's plan once before timing anything: a
    // partial warmup (r5/r6 covered only filter/agg/window codegen)
    // left whichever paths ran first in the battery charged 2-6x
    // their steady-state cost for one-time JIT/class-loading (q54
    // measured 6.98s in battery vs 1.19s isolated; q49 2.6s vs 0.7s
    // warm) — which poisoned round-over-round comparisons. A full
    // pre-run makes battery == isolated == steady state.
    selected.foreach { case (_, fn) =>
      try consume(fn(spark, sfDir)) catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // multi-sample timings, min of N (default 2): single-sample
    // numbers were contention-poisoned three rounds running — one
    // co-tenant CPU burst during a query's lone measurement read as a
    // 9× "regression" that an idle re-run couldn't reproduce. The min
    // across samples is the best estimate of the plan's cost (noise
    // under battery conditions is strictly additive).
    val samples = sys.env.get("SPARK_GRAFT_BENCH_SAMPLES")
      .map(_.toInt).filter(_ >= 1).getOrElse(3)
    val errors = scala.collection.mutable.ListBuffer[String]()
    val results = selected.map {
      case (name, fn) =>
        val dts = (1 to samples).map { _ =>
          val t0 = System.nanoTime()
          // a failed query must not masquerade as a fast one: record
          // it loudly on stderr and in the JSON errors key (benchOnly
          // queries have no oracle twin to catch breakage otherwise)
          try consume(fn(spark, sfDir)) catch {
            case e: Throwable =>
              if (!errors.contains(name)) errors += name
              System.err.println(
                s"bench: $name FAILED: ${e.getClass.getSimpleName}: " +
                  s"${Option(e.getMessage).getOrElse("").take(200)}")
          }
          val dt = (System.nanoTime() - t0) / 1e9
          // queries that persist() intermediates (dedup candidate
          // sets, decontamination gram sets) would otherwise
          // accumulate cached blocks across all 50+ queries —
          // measured 3× slowdown on late queries from the memory/GC
          // pressure, not from their plans
          spark.catalog.clearCache()
          dt
        }
        name -> dts.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // stop FIRST, print LAST: the harness reads the tail of stdout and
    // any straggler log line after the JSON breaks its one-line
    // contract (this, plus per-query UDF re-registration WARNs, left
    // rounds 3-5 with unparseable bench files)
    spark.stop()
    SparkEntry.closeFixtures()
    System.out.flush(); System.err.flush()
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"samples":$samples,"sf":"$sfDir"}""")
    System.out.flush()
    // the http gate fixtures' dispatcher threads are non-daemon; a
    // plain return would leave the JVM (and the driver's bench step)
    // waiting on them forever
    System.exit(0)
  }
}
