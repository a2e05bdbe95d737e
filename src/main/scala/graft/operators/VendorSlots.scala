package graft.operators

import graft.Pipeline.{Builder, ModuleCfg}
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §7.5 vendor connector slots: every module name the reference
  * registers gets a slot so configs PARSE and fail with the module's
  * real parameter contract plus actionable guidance — never an
  * "unknown module" error (SURVEY §7.5: "the module interface gets a
  * slot per name so configs parse").
  *
  * Each slot validates the same required parameters the reference's
  * `Parameters.validate` checks (cited per slot), then raises a
  * connector-slot error naming the local migration path. GCP clients
  * are deliberately not rebuilt; local execution targets
  * files/jdbc/kafka/iceberg/memory.
  */
object VendorSlots {

  private def slot(kind: String, module: String,
      required: Seq[Seq[String]], guidance: String): Builder =
    (_: SparkSession, cfg: ModuleCfg, _: Map[String, DataFrame]) => {
      required.foreach { alts =>
        if (!alts.exists(k => cfg.param(k).isDefined))
          throw new IllegalArgumentException(
            s"$module $kind requires parameters." + alts.mkString(" or "))
      }
      throw new IllegalStateException(
        s"$module $kind is a vendor connector slot: $guidance")
    }

  /** Sources (reference `module/source/`). */
  val sources: Map[String, Builder] = Map(
    // BigQuerySource.java: "parameters.query or table is required"
    "bigquery" -> slot("source", "bigquery", Seq(Seq("query", "table")),
      "export the table to parquet/avro and read it with the storage " +
        "source, or submit with the spark-bigquery connector jar " +
        "(com.google.cloud.spark:spark-bigquery-with-dependencies)"),
    // SpannerSource.java:182 query|table; projectId/instanceId/databaseId
    "spanner" -> slot("source", "spanner",
      Seq(Seq("projectId"), Seq("instanceId"), Seq("databaseId"),
        Seq("query", "table")),
      "use the google-cloud-spanner JDBC driver through the jdbc " +
        "source, or the spark-spanner connector"),
    // BigtableSource.java: projectId/instanceId/tableId must not be null
    "bigtable" -> slot("source", "bigtable",
      Seq(Seq("projectId"), Seq("instanceId"), Seq("tableId")),
      "use the bigtable-hbase Spark connector, or export to parquet " +
        "and read with the storage source"),
    // DatastoreSource.java: "parameters.gql must not be null"
    "datastore" -> slot("source", "datastore", Seq(Seq("gql")),
      "export the kinds to GCS and read with the storage source"),
    // FirestoreSource.java: "parameters.collection must not be null"
    "firestore" -> slot("source", "firestore", Seq(Seq("collection")),
      "export the collection and read with the storage source"),
    // DriveFileSource.java: "parameters.query must not be null"
    "drivefile" -> slot("source", "drivefile", Seq(Seq("query")),
      "sync the drive folder to local/object storage and read with " +
        "the storage source"))

  /** Sinks (reference `module/sink/`). `copyfile` is implemented
    * (local/file services); the rest are slots. */
  val sinks: Map[String, Builder] = Map(
    "bigquery" -> slot("sink", "bigquery", Seq(Seq("table")),
      "write parquet/avro with the storage sink and load it, or " +
        "submit with the spark-bigquery connector jar"),
    // SpannerSink.java: "Parameter must contain projectId/instanceId/databaseId"
    "spanner" -> slot("sink", "spanner",
      Seq(Seq("projectId"), Seq("instanceId"), Seq("databaseId")),
      "use the google-cloud-spanner JDBC driver through the jdbc sink"),
    "bigtable" -> slot("sink", "bigtable",
      Seq(Seq("projectId"), Seq("instanceId"), Seq("tableId")),
      "use the bigtable-hbase Spark connector"),
    "datastore" -> slot("sink", "datastore", Seq(Seq("kind")),
      "write json/avro with the storage sink and import"),
    "firestore" -> slot("sink", "firestore", Seq(Seq("collection")),
      "write json/avro with the storage sink and import"),
    // LocalH2Sink.java: "parameters.output must not be null"
    "localH2" -> slot("sink", "localH2", Seq(Seq("output")),
      "the embedded H2 jar is not bundled — write through the jdbc " +
        "sink against an h2:file url with the jar on the classpath"),
    // LocalNeo4jSink.java: requires `output`
    "localNeo4j" -> slot("sink", "localNeo4j", Seq(Seq("output")),
      "the embedded neo4j jar is not bundled — export csv with the " +
        "storage sink and bulk-import with neo4j-admin"),
    // LocalSolrSink.java: output + cores
    "localSolr" -> slot("sink", "localSolr",
      Seq(Seq("output"), Seq("cores")),
      "the embedded solr jar is not bundled — export json with the " +
        "storage sink and post to a solr instance"),
    // AuxiaSink.java: "projectId must not be null"
    "auxia" -> slot("sink", "auxia", Seq(Seq("projectId")),
      "vendor API; emit the event rows with the storage/jdbc sink " +
        "and deliver via the vendor's ingestion tooling"),
    // MatchingEngineSink.java:44-56 (ANN index upsert)
    "matchingEngine" -> slot("sink", "matchingEngine",
      Seq(Seq("projectId"), Seq("indexId"), Seq("idField"),
        Seq("vectorField")),
      "vendor ANN index; the similarity transform (brute-force/LSH/" +
        "IVF over an embedding column) serves local k-NN, or emit " +
        "vectors with the storage sink for external indexing"),
    // TasksSink.java: queue + format
    "tasks" -> slot("sink", "tasks", Seq(Seq("queue")),
      "vendor API (Cloud Tasks); enqueue via the http transform " +
        "against the Tasks REST endpoint instead"),
    // ActionSink.java: service must not be null (dataflow|bigquery|gemini)
    "action" -> slot("sink", "action", Seq(Seq("service")),
      "vendor job-control actions (dataflow/bigquery/gemini); run " +
        "the equivalent local action from your orchestrator"),
    "copyfile" -> CopyFileSink.build)

  /** Transforms (reference `module/transform/`). */
  val transforms: Map[String, Builder] = Map(
    // PDFExtractTransform.java (pdfbox): field with pdf bytes
    "pdfextract" -> slot("transform", "pdfextract", Seq(Seq("field")),
      "pdfbox is not bundled — plug a codec into the multimodal " +
        "transform's mapPartitions pipeline, which gives the same " +
        "per-partition batching shape"),
    // vertexai/GeminiTransform.java
    "vertexai.gemini" -> slot("transform", "vertexai.gemini",
      Seq(Seq("model")),
      "vendor LLM API; the http transform (templated request, retry/" +
        "backoff, rate gate, failure routing) drives REST endpoints " +
        "with the same batching semantics"),
    "bigtable" -> slot("transform", "bigtable",
      Seq(Seq("projectId"), Seq("instanceId"), Seq("tableId")),
      "use the bigtable-hbase Spark connector"),
    "localNeo4j" -> slot("transform", "localNeo4j", Seq(Seq("input")),
      "the embedded neo4j jar is not bundled"),
    // AutoMLTransform.java:50-70 (endpoint + model prediction)
    "automl" -> slot("transform", "automl", Seq(Seq("endpoint")),
      "vendor prediction API; the onnx transform (batched " +
        "mapPartitions, pluggable session) or the http transform " +
        "cover local/REST inference with the same batching shape"),
    // ChangeStreamTransform.java:31-43 (Spanner change streams)
    "changeStream" -> slot("transform", "changeStream",
      Seq(Seq("type")),
      "vendor change-data-capture stream; a kafka/jdbc microbatch " +
        "source over your CDC feed gives the same incremental rows"))
}

/** `copyfile` sink — the one vendor-adjacent sink with a real local
  * implementation (reference `sink/CopyFileSink.java`: copies files
  * between storage services per record or per config). Local/file
  * services execute; gcs/drive/s3 raise the connector-slot error.
  * Config: `{source, destination}` paths (or `sourceField` naming a
  * column of source paths), `sourceService`/`destinationService`
  * default `local`. */
object CopyFileSink {
  /** Validate at build time (services, destination, source contract);
    * the copy itself runs as the sink action in `write`. */
  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val p = cfg.params
    def service(key: String): String =
      p.str(key).getOrElse("local").toLowerCase(java.util.Locale.ROOT)
    Seq("sourceService", "destinationService").map(service).foreach { s =>
      if (s != "local" && s != "file")
        throw new IllegalStateException(
          s"copyfile service '$s' is a vendor connector slot: only " +
            "local file copies execute here — stage remote objects " +
            "to local paths first")
    }
    p.str("destination").getOrElse(throw new IllegalArgumentException(
      "copyfile sink requires parameters.destination"))
    if (p.str("source").isEmpty && p.str("sourceField").isEmpty)
      throw new IllegalArgumentException(
        "copyfile sink requires parameters.source or sourceField")
    if (p.str("sourceField").isDefined && inputs.isEmpty)
      throw new IllegalArgumentException(
        "copyfile sink with sourceField requires an input")
    inputs.values.headOption.map(cfg.name -> _).toMap
  }

  def write(cfg: ModuleCfg, input: Option[DataFrame]): Unit = {
    val p = cfg.params
    val dest = p.str("destination").get
    val sources: Seq[String] = p.str("source").map(Seq(_)).getOrElse {
      val field = p.str("sourceField").get
      // driver-side: file orchestration is inherently driver work
      // (files ≪ rows; same stance as the storage sink's
      // dynamic-destination rename loop)
      input.get.select(field).distinct().collect()
        .map(_.getString(0)).toSeq
    }
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val destPath = Paths.get(dest)
    val isDir = Files.isDirectory(destPath) || sources.size > 1
    if (isDir) Files.createDirectories(destPath)
    else Option(destPath.getParent).foreach(Files.createDirectories(_))
    sources.foreach { s =>
      val from = Paths.get(s)
      val to = if (isDir) destPath.resolve(from.getFileName) else destPath
      Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
