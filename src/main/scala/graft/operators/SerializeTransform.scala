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
object SerializeTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val df = TransformCommon.single(cfg, inputs)
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
        val replaceIdx = df.schema.fieldNames.indexOf(outField)
        val outSchema =
          if (replaceIdx >= 0) StructType(df.schema.fields.toSeq
            .updated(replaceIdx, StructField(outField, BinaryType)))
          else df.schema.add(outField, BinaryType)
        val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
        df.mapPartitions { it =>
          it.map { row =>
            val payload =
              encFn.encode(Row.fromSeq(idxs.toSeq.map(row.get)))
            Row.fromSeq(
              if (replaceIdx >= 0)
                row.toSeq.updated(replaceIdx, payload)
              else row.toSeq :+ payload)
          }
        }(enc)
      case "protobuf" =>
        // reference DeserializeTransform.java:91-95 parameter contract
        p.str("descriptorFile").getOrElse(
          throw new IllegalArgumentException(
            "serialize protobuf requires descriptorFile"))
        p.str("messageName").getOrElse(
          throw new IllegalArgumentException(
            "serialize protobuf requires messageName"))
        throw new IllegalStateException(
          "protobuf serialization requires the spark-protobuf module " +
            "on the classpath (--packages org.apache.spark:" +
            "spark-protobuf_2.13:<spark version>) plus the compiled " +
            "descriptor set; json and avro formats are built in")
      case other =>
        throw new IllegalArgumentException(s"serialize format: $other")
    }
    TransformCommon.finishRouted(out, cfg)
  }
}
