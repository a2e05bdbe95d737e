package graft.ops

import org.apache.avro.{LogicalTypes, Schema => ASchema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._

/** Raw-binary Avro codec for the `serialize`/`deserialize` modules
  * (reference `util/pipeline/Serialize.java:32-38` avro format:
  * GenericDatumReader/Writer over a binary en/decoder — single
  * records, no object-container framing).
  *
  * Implemented directly on avro-core (bundled with Spark) rather than
  * the spark-avro module so it needs no extra jar; the supported type
  * lattice is the intersection both sides express exactly:
  * boolean/int/long/float/double/string/bytes, records (nested),
  * arrays, string-keyed maps, union[null, T] as nullability, enum and
  * fixed decoded as string/bytes, and logical date /
  * timestamp-millis|micros. Decimal and multi-branch unions are
  * rejected at schema-mapping time with a clear error.
  *
  * Thread/serialization notes: everything here is driver-built; the
  * per-partition reader/writer instances are created inside
  * mapPartitions (avro readers are not thread-safe).
  */
object AvroCodec {

  /** Avro schema JSON → Spark type (for `deserialize`). */
  def toStructType(avroJson: String): StructType =
    sparkType(new ASchema.Parser().parse(avroJson)) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(
        s"avro schema must be a record at top level, got $other")
    }

  private def sparkType(s: ASchema): DataType = s.getType match {
    case ASchema.Type.BOOLEAN => BooleanType
    case ASchema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType
      else IntegerType
    case ASchema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
        TimestampType
      case _: LogicalTypes.LocalTimestampMillis |
           _: LogicalTypes.LocalTimestampMicros =>
        TimestampNTZType
      case _ => LongType
    }
    case ASchema.Type.FLOAT => FloatType
    case ASchema.Type.DOUBLE => DoubleType
    case ASchema.Type.STRING | ASchema.Type.ENUM => StringType
    case ASchema.Type.BYTES | ASchema.Type.FIXED => BinaryType
    case ASchema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case ASchema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case ASchema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))))
    case ASchema.Type.UNION => nonNullBranch(s).map(sparkType).getOrElse(
      throw new IllegalArgumentException(
        s"unsupported avro union (only [null, T]): $s"))
    case other => throw new IllegalArgumentException(
      s"unsupported avro type: $other")
  }

  private def isNullable(s: ASchema): Boolean =
    s.getType == ASchema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == ASchema.Type.NULL)

  private def nonNullBranch(s: ASchema): Option[ASchema] = {
    val branches = s.getTypes.asScala.filterNot(_.getType == ASchema.Type.NULL)
    if (branches.size == 1) Some(branches.head) else None
  }

  /** Spark type → Avro schema (for `serialize`, and for deriving the
    * wire schema when `deserialize` is given a Spark-style schema).
    *
    * CANONICALLY NULLABLE: every field, array item and map value is
    * union[null, T] regardless of the Spark-side nullability flag.
    * Avro binary is not self-describing — the reader must use the
    * writer's schema bit-exactly — while Spark nullability flags vary
    * with how a frame was produced (encoders, parquet, literals).
    * Fixing the wire form to always-nullable makes serialize output
    * and a config-derived deserialize schema agree by construction. */
  def toAvroSchema(st: StructType, name: String = "record"): ASchema =
    avroType(st, name, nullable = false)

  private def avroType(dt: DataType, name: String,
      nullable: Boolean): ASchema = {
    val base = dt match {
      case BooleanType => ASchema.create(ASchema.Type.BOOLEAN)
      case IntegerType | ShortType | ByteType =>
        ASchema.create(ASchema.Type.INT)
      case LongType => ASchema.create(ASchema.Type.LONG)
      case FloatType => ASchema.create(ASchema.Type.FLOAT)
      case DoubleType => ASchema.create(ASchema.Type.DOUBLE)
      case StringType => ASchema.create(ASchema.Type.STRING)
      case BinaryType => ASchema.create(ASchema.Type.BYTES)
      case DateType =>
        LogicalTypes.date().addToSchema(ASchema.create(ASchema.Type.INT))
      case TimestampType => LogicalTypes.timestampMicros()
        .addToSchema(ASchema.create(ASchema.Type.LONG))
      case TimestampNTZType => LogicalTypes.localTimestampMicros()
        .addToSchema(ASchema.create(ASchema.Type.LONG))
      case ArrayType(et, _) =>
        ASchema.createArray(avroType(et, s"${name}_item", nullable = true))
      case MapType(StringType, vt, _) =>
        ASchema.createMap(avroType(vt, s"${name}_value", nullable = true))
      case st: StructType =>
        val fields = st.fields.map { f =>
          new ASchema.Field(f.name,
            avroType(f.dataType, s"${name}_${f.name}", nullable = true),
            null, ASchema.Field.NULL_DEFAULT_VALUE)
        }
        ASchema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
      case other => throw new IllegalArgumentException(
        s"unsupported spark type for avro: $other")
    }
    if (nullable)
      ASchema.createUnion(ASchema.create(ASchema.Type.NULL), base)
    else base
  }

  /** Per-partition encoder: Row (matching `st`) → avro binary bytes.
    * Create once per partition, call per row. */
  final class RowEncoderFn(st: StructType, schemaJson: String)
      extends Serializable {
    @transient private lazy val schema =
      new ASchema.Parser().parse(schemaJson)
    @transient private lazy val writer =
      new GenericDatumWriter[GenericRecord](schema)
    @transient private lazy val bos = new ByteArrayOutputStream()

    def encode(row: Row): Array[Byte] = {
      bos.reset()
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      writer.write(toAvro(row, st, schema).asInstanceOf[GenericRecord], enc)
      enc.flush()
      bos.toByteArray
    }
  }

  /** Per-partition decoder: avro binary bytes → Row of
    * `toStructType(schemaJson)`. Returns null on decode failure (the
    * caller routes those to `.failures`). */
  final class RowDecoderFn(schemaJson: String) extends Serializable {
    @transient private lazy val schema =
      new ASchema.Parser().parse(schemaJson)
    @transient private lazy val st = toStructType(schemaJson)
    @transient private lazy val reader =
      new GenericDatumReader[GenericRecord](schema)

    def structType: StructType = st

    def decode(bytes: Array[Byte]): Row =
      if (bytes == null) null
      else try {
        val dec = DecoderFactory.get().binaryDecoder(bytes, null)
        fromAvro(reader.read(null, dec), schema, st).asInstanceOf[Row]
      } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Container-file record (already decoded by a DataFileReader) →
    * Row of `st` — the read half of `AvroFiles`. */
  def recordToRow(rec: GenericRecord, s: ASchema, st: StructType): Row =
    fromAvro(rec, s, st).asInstanceOf[Row]

  /** Row → GenericRecord for container-file writes (`AvroFiles`). */
  def rowToRecord(row: Row, st: StructType, s: ASchema): GenericRecord =
    toAvro(row, st, s).asInstanceOf[GenericRecord]

  private def toAvro(v: Any, dt: DataType, s0: ASchema): Any = {
    if (v == null) return null
    val s = if (s0.getType == ASchema.Type.UNION)
      nonNullBranch(s0).getOrElse(s0) else s0
    (dt, v) match {
      case (st: StructType, row: Row) =>
        val rec = new GenericData.Record(s)
        var i = 0
        while (i < st.fields.length) {
          rec.put(i, toAvro(row.get(i), st.fields(i).dataType,
            s.getFields.get(i).schema()))
          i += 1
        }
        rec
      case (ArrayType(et, _), seq: scala.collection.Seq[_]) =>
        seq.map(e => toAvro(e, et, s.getElementType)).asJava
      case (MapType(_, vt, _), m: scala.collection.Map[_, _]) =>
        m.map { case (k, x) =>
          String.valueOf(k) -> toAvro(x, vt, s.getValueType)
        }.toMap.asJava
      case (BinaryType, b: Array[Byte]) => java.nio.ByteBuffer.wrap(b)
      case (DateType, d: java.sql.Date) => d.toLocalDate.toEpochDay.toInt
      case (DateType, d: java.time.LocalDate) => d.toEpochDay.toInt
      case (TimestampType, t: java.sql.Timestamp) =>
        t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
      case (TimestampType, t: java.time.Instant) =>
        t.getEpochSecond * 1000000L + t.getNano / 1000L
      case (TimestampNTZType, t: java.time.LocalDateTime) =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          t.getNano / 1000L
      case _ => v
    }
  }

  private def fromAvro(v: Any, s0: ASchema, dt: DataType): Any = {
    if (v == null) return null
    val s = if (s0.getType == ASchema.Type.UNION)
      nonNullBranch(s0).getOrElse(s0) else s0
    (dt, v) match {
      case (st: StructType, rec: GenericRecord) =>
        Row.fromSeq(st.fields.toSeq.zipWithIndex.map { case (f, i) =>
          fromAvro(rec.get(i), s.getFields.get(i).schema(), f.dataType)
        })
      case (ArrayType(et, _), l: java.util.List[_]) =>
        l.asScala.toSeq.map(e => fromAvro(e, s.getElementType, et))
      case (MapType(_, vt, _), m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, x) =>
          String.valueOf(k) -> fromAvro(x, s.getValueType, vt)
        }.toMap
      case (BinaryType, b: java.nio.ByteBuffer) =>
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
      case (BinaryType, f: org.apache.avro.generic.GenericFixed) => f.bytes()
      case (StringType, cs: CharSequence) => cs.toString
      case (StringType, e: org.apache.avro.generic.GenericEnumSymbol[_]) =>
        e.toString
      case (DateType, days: java.lang.Integer) =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue))
      case (TimestampType, l: java.lang.Long) =>
        val micros = s.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => l * 1000L
          case _ => l.longValue
        }
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L))
      case (TimestampNTZType, l: java.lang.Long) =>
        val micros = s.getLogicalType match {
          case _: LogicalTypes.LocalTimestampMillis => l * 1000L
          case _ => l.longValue
        }
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case _ => v
    }
  }
}
