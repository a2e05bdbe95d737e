package graft.ops

import graft.ops.ProtoWire._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Protobuf payload codec for the `serialize`/`deserialize` modules
  * (reference `transform/DeserializeTransform.java:90-95,190` and
  * `util/schema/ProtoSchemaUtil.java`): descriptor-driven decoding of
  * single binary messages to Rows and back.
  *
  * The descriptor comes from a compiled FileDescriptorSet (protoc
  * `--descriptor_set_out`, field numbers per the public
  * `descriptor.proto`) or is derived canonically from a Spark schema
  * (`schemaToDescriptor` — field numbers 1..n in schema order), so a
  * serialize→deserialize roundtrip needs no protoc at all.
  *
  * Type lattice (aligned with spark-protobuf): double/float,
  * int32/sint32/sfixed32 → int, int64/sint64/sfixed64/uint64 → long
  * (uint64 wraps, documented), uint32/fixed32 → int, bool, string,
  * bytes, enum → symbol string, message → struct, repeated → array
  * (packed and expanded both accepted), map<k,v> → map.
  * `google.protobuf.Timestamp` → TimestampType; the numeric/string/
  * bool/bytes wrapper types unwrap to nullable scalars. Groups are
  * skipped. Absent proto3 scalars decode as null (the
  * emit-default-values=false convention); null fields are omitted on
  * encode — so a 0/""-valued field roundtrips to null, which both
  * sides of the gate see identically. */
object ProtoCodec {

  // FieldDescriptorProto.Type (descriptor.proto, public spec)
  final val TDouble = 1; final val TFloat = 2; final val TInt64 = 3
  final val TUInt64 = 4; final val TInt32 = 5; final val TFixed64 = 6
  final val TFixed32 = 7; final val TBool = 8; final val TString = 9
  final val TGroup = 10; final val TMessage = 11; final val TBytes = 12
  final val TUInt32 = 13; final val TEnum = 14; final val TSFixed32 = 15
  final val TSFixed64 = 16; final val TSInt32 = 17; final val TSInt64 = 18

  final val LabelRepeated = 3

  case class PbField(name: String, number: Int, label: Int, tpe: Int,
      typeName: String) {
    def repeated: Boolean = label == LabelRepeated
  }
  case class PbMessage(name: String, fields: Vector[PbField],
      mapEntry: Boolean) {
    // hot-path index, built once per descriptor (not per record);
    // lazy val re-derives after java serialization
    @transient lazy val byNumber: Map[Int, (PbField, Int)] =
      fields.iterator.zipWithIndex
        .map { case (f, i) => f.number -> ((f, i)) }.toMap
  }
  case class PbEnum(name: String, byNumber: Map[Int, String])
  case class PbSchema(messages: Map[String, PbMessage],
      enums: Map[String, PbEnum]) {
    def message(name: String): PbMessage =
      messages.getOrElse(name.stripPrefix("."),
        throw new IllegalArgumentException(
          s"protobuf: message '$name' not in descriptor set " +
            s"(has: ${messages.keys.toSeq.sorted.mkString(", ")})"))
  }

  private final val TimestampMsg = "google.protobuf.Timestamp"
  private final val Wrappers: Map[String, DataType] = Map(
    "google.protobuf.DoubleValue" -> DoubleType,
    "google.protobuf.FloatValue" -> FloatType,
    "google.protobuf.Int64Value" -> LongType,
    "google.protobuf.UInt64Value" -> LongType,
    "google.protobuf.Int32Value" -> IntegerType,
    "google.protobuf.UInt32Value" -> IntegerType,
    "google.protobuf.BoolValue" -> BooleanType,
    "google.protobuf.StringValue" -> StringType,
    "google.protobuf.BytesValue" -> BinaryType)

  // ---------------------------------------------------------------
  // FileDescriptorSet parsing (descriptor.proto field numbers)

  /** Parse a compiled FileDescriptorSet (protoc --descriptor_set_out). */
  def parseDescriptorSet(bytes: Array[Byte]): PbSchema = {
    val messages = mutable.Map[String, PbMessage]()
    val enums = mutable.Map[String, PbEnum]()
    val set = new Reader(bytes)
    while (set.hasMore) {
      val (f, wt) = set.readTag()
      if (f == 1 && wt == WtLen) { // FileDescriptorSet.file
        val (s, e) = set.readLen()
        parseFile(new Reader(bytes, s, e), messages, enums)
      } else set.skip(wt)
    }
    PbSchema(messages.toMap, enums.toMap)
  }

  private def parseFile(r: Reader, messages: mutable.Map[String, PbMessage],
      enums: mutable.Map[String, PbEnum]): Unit = {
    // package (2) can appear after message_type (4) in the wire form;
    // buffer message/enum ranges, resolve names after the full pass
    var pkg = ""
    val msgRanges = mutable.ArrayBuffer[(Int, Int)]()
    val enumRanges = mutable.ArrayBuffer[(Int, Int)]()
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      (f, wt) match {
        case (2, WtLen) => pkg = r.readString()
        case (4, WtLen) => msgRanges += r.readLen()
        case (5, WtLen) => enumRanges += r.readLen()
        case _ => r.skip(wt)
      }
    }
    val prefix = if (pkg.isEmpty) "" else pkg + "."
    msgRanges.foreach { case (s, e) =>
      parseMessage(new Reader(r.buf, s, e), prefix, messages, enums)
    }
    enumRanges.foreach { case (s, e) =>
      parseEnum(new Reader(r.buf, s, e), prefix, enums)
    }
  }

  private def parseMessage(r: Reader, prefix: String,
      messages: mutable.Map[String, PbMessage],
      enums: mutable.Map[String, PbEnum]): Unit = {
    var name = ""
    var mapEntry = false
    val fields = mutable.ArrayBuffer[PbField]()
    val nested = mutable.ArrayBuffer[(Int, Int)]()
    val nestedEnums = mutable.ArrayBuffer[(Int, Int)]()
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      (f, wt) match {
        case (1, WtLen) => name = r.readString()
        case (2, WtLen) => // FieldDescriptorProto
          val (s, e) = r.readLen()
          fields += parseField(new Reader(r.buf, s, e))
        case (3, WtLen) => nested += r.readLen()
        case (4, WtLen) => nestedEnums += r.readLen()
        case (7, WtLen) => // MessageOptions: map_entry = 7 (bool)
          val (s, e) = r.readLen()
          val o = new Reader(r.buf, s, e)
          while (o.hasMore) {
            val (of, owt) = o.readTag()
            if (of == 7 && owt == WtVarint) mapEntry = o.readVarint() != 0
            else o.skip(owt)
          }
        case _ => r.skip(wt)
      }
    }
    val full = prefix + name
    messages(full) =
      PbMessage(full, fields.sortBy(_.number).toVector, mapEntry)
    nested.foreach { case (s, e) =>
      parseMessage(new Reader(r.buf, s, e), full + ".", messages, enums)
    }
    nestedEnums.foreach { case (s, e) =>
      parseEnum(new Reader(r.buf, s, e), full + ".", enums)
    }
  }

  private def parseField(r: Reader): PbField = {
    var name = ""; var number = 0; var label = 1; var tpe = 0
    var typeName = ""
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      (f, wt) match {
        case (1, WtLen) => name = r.readString()
        case (3, WtVarint) => number = r.readVarint().toInt
        case (4, WtVarint) => label = r.readVarint().toInt
        case (5, WtVarint) => tpe = r.readVarint().toInt
        case (6, WtLen) => typeName = r.readString().stripPrefix(".")
        case _ => r.skip(wt)
      }
    }
    PbField(name, number, label, tpe, typeName)
  }

  private def parseEnum(r: Reader, prefix: String,
      enums: mutable.Map[String, PbEnum]): Unit = {
    var name = ""
    val values = mutable.Map[Int, String]()
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      (f, wt) match {
        case (1, WtLen) => name = r.readString()
        case (2, WtLen) => // EnumValueDescriptorProto
          val (s, e) = r.readLen()
          val v = new Reader(r.buf, s, e)
          var vn = ""; var num = 0
          while (v.hasMore) {
            val (vf, vwt) = v.readTag()
            (vf, vwt) match {
              case (1, WtLen) => vn = v.readString()
              case (2, WtVarint) => num = v.readVarint().toInt
              case _ => v.skip(vwt)
            }
          }
          values(num) = vn
        case _ => r.skip(wt)
      }
    }
    enums(prefix + name) = PbEnum(prefix + name, values.toMap)
  }

  // ---------------------------------------------------------------
  // descriptor → Spark schema

  def toStructType(schema: PbSchema, messageName: String): StructType =
    structOf(schema, schema.message(messageName), Set.empty)

  private def structOf(schema: PbSchema, msg: PbMessage,
      seen: Set[String]): StructType = {
    if (seen.contains(msg.name)) throw new IllegalArgumentException(
      s"protobuf: recursive message '${msg.name}' cannot map to a " +
        "fixed relational schema")
    StructType(msg.fields.map(f =>
      StructField(f.name, fieldType(schema, f, seen + msg.name))))
  }

  private def fieldType(schema: PbSchema, f: PbField,
      seen: Set[String]): DataType = {
    val scalar: DataType = f.tpe match {
      case TDouble => DoubleType
      case TFloat => FloatType
      case TInt64 | TSInt64 | TSFixed64 | TUInt64 | TFixed64 => LongType
      case TInt32 | TSInt32 | TSFixed32 | TUInt32 | TFixed32 => IntegerType
      case TBool => BooleanType
      case TString => StringType
      case TBytes => BinaryType
      case TEnum => StringType
      case TMessage => f.typeName match {
        case TimestampMsg => TimestampType
        case w if Wrappers.contains(w) => Wrappers(w)
        case other =>
          val m = schema.message(other)
          if (m.mapEntry) {
            val kt = fieldType(schema, m.fields(0), seen)
            val vt = fieldType(schema, m.fields(1), seen)
            return MapType(kt, vt) // repeated map entries ARE the map
          } else structOf(schema, m, seen)
      }
      case TGroup => throw new IllegalArgumentException(
        "protobuf: groups (proto1) are not supported")
      case other => throw new IllegalArgumentException(
        s"protobuf: field type $other not supported")
    }
    if (f.repeated) ArrayType(scalar) else scalar
  }

  // ---------------------------------------------------------------
  // decode: message bytes → Row

  def decode(schema: PbSchema, messageName: String,
      bytes: Array[Byte]): Row =
    decodeMsg(schema, schema.message(messageName),
      new Reader(bytes)).asInstanceOf[Row]

  private def decodeMsg(schema: PbSchema, msg: PbMessage,
      r: Reader): Any = {
    val byNumber = msg.byNumber
    val values = new Array[Any](msg.fields.length)
    msg.fields.iterator.zipWithIndex.foreach { case (f, i) =>
      if (f.repeated) values(i) =
        if (isMapField(schema, f)) mutable.LinkedHashMap[Any, Any]()
        else mutable.ArrayBuffer[Any]()
    }
    while (r.hasMore) {
      val (num, wt) = r.readTag()
      byNumber.get(num) match {
        case None => r.skip(wt)
        // a wire type that disagrees with the descriptor (schema
        // evolution, foreign writer, reused field number) is an
        // UNKNOWN field, as protobuf-java treats it — reading it with
        // the declared type's reader would desync the stream and
        // silently corrupt every later field
        case Some((f, _)) if wt != wireOf(f.tpe) &&
            !(f.repeated && wt == WtLen && packable(f.tpe)) =>
          r.skip(wt)
        case Some((f, i)) =>
          if (f.repeated && wt == WtLen && packable(f.tpe)) {
            // packed scalars: one length-delimited run of values
            val (s, e) = r.readLen()
            val p = new Reader(r.buf, s, e)
            val buf = values(i).asInstanceOf[mutable.ArrayBuffer[Any]]
            while (p.hasMore) buf += readScalar(schema, f, p, wireOf(f.tpe))
          } else if (f.repeated) {
            values(i) match {
              case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
                val (s, e) = r.readLen()
                val entry = schema.message(f.typeName)
                val row = decodeMsg(schema, entry,
                  new Reader(r.buf, s, e)).asInstanceOf[Row]
                // conformant serializers OMIT default-valued entry
                // fields ("" key, 0 value) — substitute the proto3
                // default; a null map key would crash Spark's encoder
                val k = Option(row.get(0))
                  .getOrElse(proto3Default(entry.fields(0)))
                val v = Option(row.get(1))
                  .getOrElse(proto3Default(entry.fields(1)))
                m(k) = v
              case b: mutable.ArrayBuffer[Any @unchecked] =>
                b += readScalar(schema, f, r, wt)
            }
          } else values(i) = readScalar(schema, f, r, wt)
      }
    }
    Row.fromSeq(values.toSeq.map {
      case b: mutable.ArrayBuffer[Any @unchecked] =>
        if (b.isEmpty) null else b.toSeq
      case m: mutable.LinkedHashMap[Any @unchecked, Any @unchecked] =>
        if (m.isEmpty) null else m.toMap
      case v => v
    })
  }

  /** proto3 default for an absent scalar (map-entry fields only —
    * elsewhere absent decodes as null by design). */
  private def proto3Default(f: PbField): Any = f.tpe match {
    case TDouble => 0.0d
    case TFloat => 0.0f
    case TInt64 | TSInt64 | TSFixed64 | TUInt64 | TFixed64 => 0L
    case TInt32 | TSInt32 | TSFixed32 | TUInt32 | TFixed32 => 0
    case TBool => false
    case TString => ""
    case TBytes => Array.empty[Byte]
    case _ => null
  }

  private def isMapField(schema: PbSchema, f: PbField): Boolean =
    f.tpe == TMessage && f.typeName != TimestampMsg &&
      !Wrappers.contains(f.typeName) &&
      schema.messages.get(f.typeName).exists(_.mapEntry)

  private def packable(tpe: Int): Boolean = tpe match {
    case TString | TBytes | TMessage | TGroup => false
    case _ => true
  }

  private def wireOf(tpe: Int): Int = tpe match {
    case TDouble | TFixed64 | TSFixed64 => WtFixed64
    case TFloat | TFixed32 | TSFixed32 => WtFixed32
    case TString | TBytes | TMessage => WtLen
    case _ => WtVarint
  }

  private def readScalar(schema: PbSchema, f: PbField, r: Reader,
      wt: Int): Any = f.tpe match {
    case TDouble => java.lang.Double.longBitsToDouble(r.readFixed64())
    case TFloat => java.lang.Float.intBitsToFloat(r.readFixed32())
    case TInt64 | TUInt64 => r.readVarint()
    case TInt32 | TUInt32 => r.readVarint().toInt
    case TSInt64 => zigzagDecode(r.readVarint())
    case TSInt32 => zigzagDecode(r.readVarint()).toInt
    case TFixed64 | TSFixed64 => r.readFixed64()
    case TFixed32 | TSFixed32 => r.readFixed32()
    case TBool => r.readVarint() != 0
    case TString => r.readString()
    case TBytes => r.readBytes()
    case TEnum =>
      val n = r.readVarint().toInt
      schema.enums.get(f.typeName).flatMap(_.byNumber.get(n))
        .getOrElse(n.toString)
    case TMessage =>
      val (s, e) = r.readLen()
      val sub = new Reader(r.buf, s, e)
      f.typeName match {
        case TimestampMsg => decodeTimestamp(sub)
        case w if Wrappers.contains(w) => decodeWrapper(sub, Wrappers(w))
        case other => decodeMsg(schema, schema.message(other), sub)
      }
    case other => throw new IllegalArgumentException(
      s"protobuf: field type $other not supported")
  }

  private def decodeTimestamp(r: Reader): java.sql.Timestamp = {
    var seconds = 0L; var nanos = 0
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      (f, wt) match {
        case (1, WtVarint) => seconds = r.readVarint()
        case (2, WtVarint) => nanos = r.readVarint().toInt
        case _ => r.skip(wt)
      }
    }
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(seconds, nanos))
  }

  private def wrapperWire(dt: DataType): Int = dt match {
    case DoubleType => WtFixed64
    case FloatType => WtFixed32
    case StringType | BinaryType => WtLen
    case _ => WtVarint
  }

  private def decodeWrapper(r: Reader, dt: DataType): Any = {
    var out: Any = null
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      // same unknown-field rule as decodeMsg: a value field with the
      // wrong wire type is skipped, not misread
      if (f == 1 && wt == wrapperWire(dt)) out = dt match {
        case DoubleType => java.lang.Double.longBitsToDouble(r.readFixed64())
        case FloatType => java.lang.Float.intBitsToFloat(r.readFixed32())
        case LongType => r.readVarint()
        case IntegerType => r.readVarint().toInt
        case BooleanType => r.readVarint() != 0
        case StringType => r.readString()
        case BinaryType => r.readBytes()
        case _ => { r.skip(wt); null }
      } else r.skip(wt)
    }
    out
  }

  // ---------------------------------------------------------------
  // encode: Row → message bytes

  def encode(schema: PbSchema, messageName: String, row: Row)
      : Array[Byte] = {
    val w = new Writer
    encodeMsg(schema, schema.message(messageName), row, w)
    w.toByteArray
  }

  private def encodeMsg(schema: PbSchema, msg: PbMessage, row: Row,
      w: Writer): Unit = {
    // align by NAME when the Row carries a schema (DataFrame struct
    // values do): a protoc descriptor's field order need not match
    // the Spark struct's, and positional pairing would write values
    // under each other's field numbers. Schemaless Rows (built by
    // this codec's own callers in descriptor order) stay positional.
    val nameIdx: String => Int =
      if (row.schema != null) {
        val byName = row.schema.fieldNames.zipWithIndex.toMap
        n => byName.getOrElse(n, -1)
      } else {
        val pos = msg.fields.iterator.zipWithIndex
          .map { case (f, i) => f.name -> i }.toMap
        n => pos(n)
      }
    msg.fields.foreach { f =>
      val i = nameIdx(f.name)
      val v = if (i < 0) null else row.get(i)
      if (v != null) {
        if (f.repeated) v match {
          case m: scala.collection.Map[_, _] =>
            val entry = schema.message(f.typeName)
            m.foreach { case (k, x) =>
              val ew = new Writer
              encodeScalarField(schema, entry.fields(0), k, ew)
              encodeScalarField(schema, entry.fields(1), x, ew)
              w.writeTag(f.number, WtLen)
              w.writeBytes(ew.toByteArray)
            }
          case seq: scala.collection.Seq[_] =>
            if (packable(f.tpe) && seq.nonEmpty) {
              // packed form — the proto3 serializer default for
              // packable repeated scalars (one LEN run of bare
              // values); string/bytes/message stay expanded per spec
              val pw = new Writer
              seq.foreach(e => encodeScalarValue(schema, f, e, pw))
              w.writeTag(f.number, WtLen)
              w.writeBytes(pw.toByteArray)
            } else
              seq.foreach(e => encodeScalarField(schema, f, e, w))
          case other => throw new IllegalArgumentException(
            s"protobuf: repeated field '${f.name}' got " +
              other.getClass.getName)
        } else encodeScalarField(schema, f, v, w)
      }
    }
  }

  /** Bare value bytes of a PACKABLE scalar (no tag) — the element
    * encoding inside a packed run. */
  private def encodeScalarValue(schema: PbSchema, f: PbField, v: Any,
      w: Writer): Unit = {
    if (v == null) return
    f.tpe match {
      case TDouble => w.writeFixed64(java.lang.Double.doubleToLongBits(
        v.asInstanceOf[Number].doubleValue))
      case TFloat => w.writeFixed32(java.lang.Float.floatToIntBits(
        v.asInstanceOf[Number].floatValue))
      case TInt64 | TUInt64 => w.writeVarint(
        v.asInstanceOf[Number].longValue)
      // negative int32 encodes as 10-byte sign-extended varint
      case TInt32 | TUInt32 => w.writeVarint(
        v.asInstanceOf[Number].intValue.toLong)
      case TSInt64 => w.writeVarint(zigzagEncode(
        v.asInstanceOf[Number].longValue))
      case TSInt32 => w.writeVarint(zigzagEncode(
        v.asInstanceOf[Number].intValue.toLong))
      case TFixed64 | TSFixed64 => w.writeFixed64(
        v.asInstanceOf[Number].longValue)
      case TFixed32 | TSFixed32 => w.writeFixed32(
        v.asInstanceOf[Number].intValue)
      case TBool => w.writeVarint(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case TEnum =>
        val e = schema.enums.getOrElse(f.typeName,
          throw new IllegalArgumentException(
            s"protobuf: enum '${f.typeName}' not in descriptor set"))
        val num = e.byNumber.collectFirst {
          case (n, sym) if sym == v.toString => n
        }.getOrElse(v.toString.toInt)
        w.writeVarint(num.toLong)
      case other => throw new IllegalArgumentException(
        s"protobuf: type $other is not packable")
    }
  }

  private def encodeScalarField(schema: PbSchema, f: PbField, v: Any,
      w: Writer): Unit = {
    if (v == null) return
    f.tpe match {
      case TString =>
        w.writeTag(f.number, WtLen)
        w.writeString(v.toString)
      case TBytes =>
        w.writeTag(f.number, WtLen)
        w.writeBytes(v.asInstanceOf[Array[Byte]])
      case TDouble | TFloat | TInt64 | TUInt64 | TInt32 | TUInt32 |
          TSInt64 | TSInt32 | TFixed64 | TSFixed64 | TFixed32 |
          TSFixed32 | TBool | TEnum =>
        // packable scalars: one shared element encoding with the
        // packed path (a fix there is a fix here), tag wire type is
        // exactly wireOf
        w.writeTag(f.number, wireOf(f.tpe))
        encodeScalarValue(schema, f, v, w)
      case TMessage =>
        val body = new Writer
        f.typeName match {
          case TimestampMsg =>
            val inst = v match {
              case t: java.sql.Timestamp => t.toInstant
              case t: java.time.Instant => t
              case other => throw new IllegalArgumentException(
                s"protobuf: timestamp field '${f.name}' got " +
                  other.getClass.getName)
            }
            if (inst.getEpochSecond != 0) {
              body.writeTag(1, WtVarint)
              body.writeVarint(inst.getEpochSecond)
            }
            if (inst.getNano != 0) {
              body.writeTag(2, WtVarint)
              body.writeVarint(inst.getNano.toLong)
            }
          case wn if Wrappers.contains(wn) =>
            encodeScalarField(schema,
              PbField("value", 1, 1, wrapperScalarType(wn), ""), v, body)
          case other =>
            encodeMsg(schema, schema.message(other),
              v.asInstanceOf[Row], body)
        }
        w.writeTag(f.number, WtLen)
        w.writeBytes(body.toByteArray)
      case other => throw new IllegalArgumentException(
        s"protobuf: field type $other not supported")
    }
  }

  private def wrapperScalarType(name: String): Int = Wrappers(name) match {
    case DoubleType => TDouble
    case FloatType => TFloat
    case LongType => TInt64
    case IntegerType => TInt32
    case BooleanType => TBool
    case StringType => TString
    case BinaryType => TBytes
    case other => throw new IllegalArgumentException(other.toString)
  }

  // ---------------------------------------------------------------
  // Spark schema → canonical descriptor (no protoc needed)

  /** Derive a canonical message graph from a Spark schema: field
    * numbers 1..n in schema order, nested structs become nested
    * messages named `<Parent>_<field>`. The SAME derivation on both
    * serialize and deserialize sides yields interoperable wire data
    * (reference configs instead compile .proto via protoc; this is
    * the jar-free equivalent for engine-to-engine pipes). */
  def schemaToDescriptor(st: StructType,
      messageName: String = "graft.Record"): PbSchema = {
    val messages = mutable.Map[String, PbMessage]()
    def build(st: StructType, name: String): Unit = {
      val fields = st.fields.toVector.zipWithIndex.map { case (f, i) =>
        val (tpe, typeName, label) = pbType(f.dataType, s"${name}_${f.name}")
        PbField(f.name, i + 1, label, tpe, typeName)
      }
      messages(name) = PbMessage(name, fields, mapEntry = false)
    }
    def pbType(dt: DataType, nested: String): (Int, String, Int) =
      dt match {
        case DoubleType => (TDouble, "", 1)
        case FloatType => (TFloat, "", 1)
        case LongType => (TInt64, "", 1)
        case IntegerType | ShortType | ByteType => (TInt32, "", 1)
        case BooleanType => (TBool, "", 1)
        case StringType => (TString, "", 1)
        case BinaryType => (TBytes, "", 1)
        case TimestampType => (TMessage, TimestampMsg, 1)
        case ArrayType(et, _) =>
          val (t, tn, lbl) = pbType(et, nested)
          require(lbl != LabelRepeated,
            "protobuf: nested arrays need an explicit wrapper message")
          (t, tn, LabelRepeated)
        case MapType(kt, vt, _) =>
          val entryName = nested + "Entry"
          val (ktpe, ktn, _) = pbType(kt, entryName + "_key")
          val (vtpe, vtn, _) = pbType(vt, entryName + "_value")
          messages(entryName) = PbMessage(entryName, Vector(
            PbField("key", 1, 1, ktpe, ktn),
            PbField("value", 2, 1, vtpe, vtn)), mapEntry = true)
          (TMessage, entryName, LabelRepeated)
        case s: StructType =>
          build(s, nested)
          (TMessage, nested, 1)
        case other => throw new IllegalArgumentException(
          s"protobuf: unsupported spark type $other (decimal/date/ntz " +
            "have no canonical proto3 scalar — cast upstream)")
      }
    build(st, messageName)
    PbSchema(messages.toMap, Map.empty)
  }

  /** Serialize a PbSchema back to FileDescriptorSet bytes — what
    * protoc would emit for the equivalent .proto; lets a descriptor
    * derived via `schemaToDescriptor` be exported for external
    * consumers, and gives the spec tests a protoc-free fixture. */
  def toDescriptorSetBytes(schema: PbSchema,
      fileName: String = "graft.proto"): Array[Byte] = {
    // split full names into (package, simple) by last dot
    def split(full: String): (String, String) = {
      val i = full.lastIndexOf('.')
      if (i < 0) ("", full) else (full.take(i), full.drop(i + 1))
    }
    val byPkg = (schema.messages.keys ++ schema.enums.keys).toSeq
      .map(split).groupBy(_._1)
    val set = new Writer
    byPkg.toSeq.sortBy(_._1).foreach { case (pkg, names) =>
      val file = new Writer
      file.writeTag(1, WtLen); file.writeString(s"$pkg/$fileName")
      if (pkg.nonEmpty) { file.writeTag(2, WtLen); file.writeString(pkg) }
      names.map(_._2).sorted.foreach { simple =>
        val full = if (pkg.isEmpty) simple else s"$pkg.$simple"
        schema.messages.get(full).foreach { m =>
          file.writeTag(4, WtLen)
          file.writeBytes(messageBytes(m, simple))
        }
        schema.enums.get(full).foreach { e =>
          file.writeTag(5, WtLen)
          file.writeBytes(enumBytes(e, simple))
        }
      }
      set.writeTag(1, WtLen)
      set.writeBytes(file.toByteArray)
    }
    set.toByteArray
  }

  private def messageBytes(m: PbMessage, simpleName: String)
      : Array[Byte] = {
    val w = new Writer
    w.writeTag(1, WtLen); w.writeString(simpleName)
    m.fields.foreach { f =>
      val fw = new Writer
      fw.writeTag(1, WtLen); fw.writeString(f.name)
      fw.writeTag(3, WtVarint); fw.writeVarint(f.number.toLong)
      fw.writeTag(4, WtVarint); fw.writeVarint(f.label.toLong)
      fw.writeTag(5, WtVarint); fw.writeVarint(f.tpe.toLong)
      if (f.typeName.nonEmpty) {
        fw.writeTag(6, WtLen); fw.writeString("." + f.typeName)
      }
      w.writeTag(2, WtLen)
      w.writeBytes(fw.toByteArray)
    }
    if (m.mapEntry) {
      val ow = new Writer
      ow.writeTag(7, WtVarint); ow.writeVarint(1L)
      w.writeTag(7, WtLen)
      w.writeBytes(ow.toByteArray)
    }
    w.toByteArray
  }

  private def enumBytes(e: PbEnum, simpleName: String): Array[Byte] = {
    val w = new Writer
    w.writeTag(1, WtLen); w.writeString(simpleName)
    e.byNumber.toSeq.sortBy(_._1).foreach { case (num, sym) =>
      val vw = new Writer
      vw.writeTag(1, WtLen); vw.writeString(sym)
      vw.writeTag(2, WtVarint); vw.writeVarint(num.toLong)
      w.writeTag(2, WtLen)
      w.writeBytes(vw.toByteArray)
    }
    w.toByteArray
  }

  // ---------------------------------------------------------------
  // per-partition fns (mirror AvroCodec's Row codecs)

  /** Per-partition decoder: proto bytes → Row (null on failure, the
    * caller routes to `.failures`). Ships the descriptor as bytes so
    * the task-side object is rebuilt lazily. */
  final class RowDecoderFn(descriptorSet: Array[Byte],
      messageName: String) extends Serializable {
    @transient private lazy val schema = parseDescriptorSet(descriptorSet)
    def structType: StructType = toStructType(schema, messageName)
    def decode(bytes: Array[Byte]): Row =
      if (bytes == null) null
      else try ProtoCodec.decode(schema, messageName, bytes)
      catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Per-partition encoder: Row → proto bytes. */
  final class RowEncoderFn(descriptorSet: Array[Byte],
      messageName: String) extends Serializable {
    @transient private lazy val schema = parseDescriptorSet(descriptorSet)
    def encode(row: Row): Array[Byte] =
      ProtoCodec.encode(schema, messageName, row)
  }
}
