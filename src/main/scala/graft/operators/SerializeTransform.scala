package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.ops.AvroCodec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `serialize` transform (reference `util/pipeline/Serialize.java`
  * encode direction): pack selected fields of each row into a single
  * payload column.
  *
  * Formats: `json` / `csv` (codegen'd to_json/to_csv over a struct),
  * `avro` (raw-binary single-record encoding via AvroCodec —
  * mapPartitions so the datum writer is built once per partition, not
  * per row), `protobuf` (connector slot: needs the spark-protobuf
  * module + a compiled descriptor set, raises an actionable error).
  *
  * Config: `format`, `fields` (default: all columns), `outputField`
  * (default `payload`). The input columns are preserved; the payload
  * column is appended (or replaces an existing column of that name).
  */
/** Shared protobuf descriptor resolution for serialize/deserialize:
  * `descriptorFile` (a protoc FileDescriptorSet, read through the
  * Hadoop FS so gs://-style paths work) + `messageName`, or a
  * canonical descriptor derived from a Spark schema when no file is
  * given. */
object ProtoTransformCommon {
  def resolveDescriptor(spark: SparkSession,
      p: com.fasterxml.jackson.databind.JsonNode,
      schemaForDerivation: Option[StructType])
      : (Array[Byte], String) =
    p.str("descriptorFile") match {
      case Some(path) =>
        val msgName = p.str("messageName").getOrElse(
          throw new IllegalArgumentException(
            "protobuf with descriptorFile requires messageName"))
        val hp = new org.apache.hadoop.fs.Path(path)
        val fs = hp.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val in = fs.open(hp)
        val bytes =
          try {
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
            bos.toByteArray
          } finally in.close()
        // parse eagerly so a bad descriptor fails at build time with
        // a config-shaped error, not inside a task
        graft.ops.ProtoCodec.parseDescriptorSet(bytes)
          .message(msgName)
        (bytes, msgName)
      case None =>
        val st = schemaForDerivation.getOrElse(
          throw new IllegalArgumentException(
            "protobuf requires descriptorFile+messageName, or a " +
              "schema to derive a canonical descriptor from"))
        val msgName = p.str("messageName").getOrElse("graft.Record")
        val schema = graft.ops.ProtoCodec.schemaToDescriptor(st, msgName)
        (graft.ops.ProtoCodec.toDescriptorSetBytes(schema), msgName)
    }
}

object SerializeTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    // payload packing is per-row CPU work (to_json/to_csv/codec
    // loops); widen one-split inputs so it parallelizes (see
    // DeserializeTransform)
    val df = TransformCommon.widen(TransformCommon.single(cfg, inputs))
    val p = cfg.params
    val outField = p.str("outputField").getOrElse("payload")
    val fieldNames = {
      val fs = p.strArr("fields")
      if (fs.nonEmpty) fs else df.columns.toSeq
    }
    fieldNames.foreach(f => require(df.columns.contains(f),
      s"serialize: unknown field '$f'"))
    val src = struct(fieldNames.map(col): _*)
    val out = p.str("format").getOrElse("json") match {
      case "json" => df.withColumn(outField, to_json(src))
      case "csv" => df.withColumn(outField, to_csv(src))
      case "avro" =>
        val srcSchema = StructType(fieldNames.map(f => df.schema(f)))
        val avroJson = AvroCodec.toAvroSchema(srcSchema).toString
        val idxs = fieldNames.map(f =>
          df.schema.fieldNames.indexOf(f)).toArray
        val encFn = new AvroCodec.RowEncoderFn(srcSchema, avroJson)
        TransformCommon.encodePayload(df, idxs, outField, encFn.encode)
      case "protobuf" =>
        // native wire-format codec (ops/ProtoCodec — no protobuf jar
        // ships in this image): descriptorFile+messageName use a
        // protoc-compiled FileDescriptorSet; without one the
        // descriptor derives canonically from the selected fields'
        // schema (field numbers 1..n), which the deserialize side
        // reproduces — see ProtoCodec.schemaToDescriptor
        val srcSchema = StructType(fieldNames.map(f => df.schema(f)))
        val (descBytes, msgName) =
          ProtoTransformCommon.resolveDescriptor(spark, p,
            Some(srcSchema))
        // align columns to the MESSAGE's field order BY NAME: a
        // protoc descriptor is free to order/number fields any way it
        // likes, so positional pairing would silently write values
        // under each other's field numbers. Descriptor fields with no
        // selected column encode as absent; selected columns missing
        // from the message are an error.
        val msgFields = graft.ops.ProtoCodec
          .parseDescriptorSet(descBytes).message(msgName).fields
        fieldNames.foreach(f => require(msgFields.exists(_.name == f),
          s"serialize protobuf: field '$f' is not in message " +
            s"'$msgName' (has: ${msgFields.map(_.name).mkString(", ")})"))
        val selected = fieldNames.toSet
        val idxs = msgFields.map(mf =>
          if (selected(mf.name)) df.schema.fieldNames.indexOf(mf.name)
          else -1).toArray
        val encFn = new graft.ops.ProtoCodec.RowEncoderFn(
          descBytes, msgName)
        TransformCommon.encodePayload(df, idxs, outField, encFn.encode)
      case other =>
        throw new IllegalArgumentException(s"serialize format: $other")
    }
    TransformCommon.finishRouted(out, cfg)
  }
}
