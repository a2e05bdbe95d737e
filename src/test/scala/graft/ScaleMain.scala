package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale smoke: replicate the sf0.1 corpus N× (unique ids,
  * perturbed text so near-dup structure survives without becoming
  * pure exact-dups) and time the dedup/analysis paths — the
  * README "measured scaling" numbers. Test scope; never ships. */
object ScaleMain {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 20
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n0 = docs0.count()
    // replicate with unique ids; every 3rd copy keeps text identical
    // (exact dups), others get a copy-tag suffix (near-dups for LSH)
    val docs = docs0.crossJoin(
        spark.range(mult).withColumnRenamed("id", "__copy"))
      .withColumn("doc_id", col("doc_id") * mult + col("__copy"))
      .withColumn("text",
        when(col("__copy") % 3 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" copytag"),
            col("__copy") % 7)))
      .drop("__copy")
      .repartition(32).persist()
    val total = docs.count()
    println(s"SCALE corpus: $n0 -> $total docs (x$mult)")

    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f
      val n = df.count()
      println(f"SCALE $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    import graft.Pipeline.ModuleCfg
    import graft.config.Json
    def dedup(params: String): DataFrame =
      graft.operators.DedupTransform.build(spark,
        ModuleCfg("dd", "dedup", Seq("d"), Nil, Json.parse(params),
          Json.obj()), Map("d" -> docs))("dd")

    time("exact-canonical") { dedup(
      """{"method":"exact","field":"text","idField":"doc_id","keep":"canonical"}""") }
    time("exact") { dedup(
      """{"method":"exact","field":"text","idField":"doc_id"}""") }
    time("minhash") { dedup(
      """{"method":"minhash","field":"text","idField":"doc_id"}""") }
    time("simhash") { dedup(
      """{"method":"simhash","field":"text","idField":"doc_id"}""") }
    time("ngram-jaccard") { dedup(
      """{"method":"ngram","field":"text","idField":"doc_id","ngramSize":5,"threshold":0.7}""") }
    time("textAnalysis") {
      graft.operators.TextAnalysisTransform.build(spark,
        ModuleCfg("ta", "textAnalysis", Seq("d"), Nil, Json.parse(
          """{"field":"text","analyses":["langid","quality","tokens","fingerprint"]}"""),
          Json.obj()), Map("d" -> docs))("ta")
    }
    spark.stop()
  }
}
