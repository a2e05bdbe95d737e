package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Verify <sfDir> <outDir> [q1,q2,...]")
    val Array(sfDir, outDir, rest @ _*) = args
    // optional 3rd arg: comma-separated query names (fast iteration)
    val only = rest.headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // lenient reference semantics (Spark 4 defaults ANSI on)
      .config("spark.sql.ansi.enabled", "false")
      // only affects genuinely-nanos parquet columns (surfaced as
      // int64, which Strategy.toTimestamp converts by magnitude);
      // harmless for micros/NTZ files — kept so a testdata
      // regeneration back to TIMESTAMP(NANOS) stays readable
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // drift tripwire: one-line diagnosis when the driver regenerates
    // the testdata with a different physical ts encoding (this once
    // silently flipped five gates red)
    try System.err.println("[verify] events.ts surfaces as: " +
      spark.read.parquet(s"$sfDir/events.parquet")
        .schema("ts").dataType.simpleString)
    catch { case e: Throwable =>
      System.err.println(s"[verify] events.ts probe failed: $e") }
    // environment probe: the kafka/iceberg happy paths stay blocked
    // until matching jars appear on this machine — report per round
    // so the README "environment-blocked" note flips the round they do
    try {
      val wanted = Seq("spark-sql-kafka", "kafka-clients",
        "iceberg-spark-runtime")
      val roots = Seq("/opt/spark/jars",
        sys.props.getOrElse("user.home", "") + "/.cache/coursier",
        sys.props.getOrElse("user.home", "") + "/.ivy2")
      // ONE walk per root collects every wanted name; an unreadable
      // root degrades to "not found there", not a dead probe
      val found = scala.collection.mutable.Set[String]()
      roots.foreach { r =>
        val f = new java.io.File(r)
        if (f.exists) try {
          val s = java.nio.file.Files.walk(f.toPath)
          try s.forEach { p =>
            val n = p.getFileName.toString
            if (n.endsWith(".jar"))
              wanted.foreach(w => if (n.startsWith(w)) found += w)
          } finally s.close()
        } catch { case _: Throwable => () }
      }
      System.err.println("[verify] connector-jar probe: " + wanted
        .map(w => s"$w=${if (found(w)) "FOUND" else "absent"}")
        .mkString(", "))
    } catch { case e: Throwable =>
      System.err.println(s"[verify] connector-jar probe failed: $e") }
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // house rule (r20 verdict: q207's raw array<float> killed the
        // driver's pandas comparator with "unhashable type: ndarray"):
        // compared gate output must serialize arrays/maps to strings
        // (q13 concat, q121/q207 array_join). Fail HERE, at build
        // time, not in the driver's comparison harness.
        import org.apache.spark.sql.types._
        def hasContainer(t: DataType): Boolean = t match {
          case _: ArrayType | _: MapType => true
          case s: StructType => s.fields.exists(f => hasContainer(f.dataType))
          case _ => false
        }
        val offending = df.schema.fields.filter(f => hasContainer(f.dataType))
        require(offending.isEmpty,
          s"gate $name emits array/map column(s) " +
            offending.map(_.name).mkString("[", ",", "]") +
            " — serialize to a string (array_join/concat) before the" +
            " final select; the driver's comparator cannot sort them")
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop persisted intermediates (dedup candidates, gram sets) so
      // caches don't accumulate across the whole battery
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // the gate fixtures (jdk.httpserver) run non-daemon dispatcher
    // threads; without this the JVM never exits and the driver's
    // correctness step hangs
    SparkEntry.closeFixtures()
    System.out.flush(); System.err.flush()
    // belt and braces: any straggler non-daemon thread (vendor JDBC
    // timers, streaming state maintenance racing stop) must not stall
    // the driver — all output is already on disk/stdout
    System.exit(0)
  }
}
