package graft

import graft.ops.{ProtoCodec, ProtoWire}
import graft.ops.ProtoCodec._
import graft.ops.ProtoWire.{Reader, Writer, WtLen, WtVarint}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Native protobuf wire codec (ops/ProtoWire + ops/ProtoCodec): the
  * encoding itself is pinned against the public spec byte-for-byte,
  * then descriptor/row roundtrips, then the module surface. */
class ProtoCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("varint encoding matches the spec's worked examples") {
    // protobuf.dev/programming-guides/encoding: 150 -> 0x96 0x01
    val w = new Writer
    w.writeVarint(150L)
    assert(w.toByteArray.toSeq === Seq(0x96.toByte, 0x01.toByte))
    // -1 is 10 bytes of 0xff..0x01 (sign-extended uint64)
    val w2 = new Writer
    w2.writeVarint(-1L)
    assert(w2.toByteArray.length === 10)
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, Long.MaxValue, Long.MinValue,
        -1L)) {
      val ww = new Writer
      ww.writeVarint(v)
      assert(new Reader(ww.toByteArray).readVarint() === v)
    }
  }

  test("zigzag matches the spec table") {
    // spec: 0->0, -1->1, 1->2, -2->3, 2147483647->4294967294
    assert(ProtoWire.zigzagEncode(0L) === 0L)
    assert(ProtoWire.zigzagEncode(-1L) === 1L)
    assert(ProtoWire.zigzagEncode(1L) === 2L)
    assert(ProtoWire.zigzagEncode(-2L) === 3L)
    assert(ProtoWire.zigzagEncode(2147483647L) === 4294967294L)
    for (v <- Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue, 42L, -42L))
      assert(ProtoWire.zigzagDecode(ProtoWire.zigzagEncode(v)) === v)
  }

  test("message encoding matches the spec's Test1 example") {
    // spec: message Test1 { int32 a = 1; } with a=150 -> 08 96 01
    val schema = PbSchema(Map("Test1" -> PbMessage("Test1",
      Vector(PbField("a", 1, 1, TInt32, "")), mapEntry = false)),
      Map.empty)
    val bytes = ProtoCodec.encode(schema, "Test1", Row(150))
    assert(bytes.toSeq ===
      Seq(0x08.toByte, 0x96.toByte, 0x01.toByte))
    assert(ProtoCodec.decode(schema, "Test1", bytes) === Row(150))
  }

  test("schema -> descriptor -> descriptor-set bytes -> schema " +
      "roundtrip preserves the struct") {
    val st = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("flag", BooleanType),
      StructField("blob", BinaryType),
      StructField("tags", ArrayType(StringType)),
      StructField("attrs", MapType(StringType, LongType)),
      StructField("at", TimestampType),
      StructField("sub", StructType(Seq(
        StructField("x", IntegerType),
        StructField("y", FloatType))))))
    val schema = schemaToDescriptor(st, "graft.T")
    val bytes = toDescriptorSetBytes(schema)
    val parsed = parseDescriptorSet(bytes)
    val st2 = toStructType(parsed, "graft.T")
    assert(st2.fields.map(f => (f.name, f.dataType)).toSeq ===
      st.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("row roundtrip across every supported type") {
    val st = StructType(Seq(
      StructField("id", LongType),
      StructField("neg", IntegerType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("ratio", FloatType),
      StructField("flag", BooleanType),
      StructField("blob", BinaryType),
      StructField("tags", ArrayType(StringType)),
      StructField("nums", ArrayType(LongType)),
      StructField("attrs", MapType(StringType, LongType)),
      StructField("at", TimestampType),
      StructField("sub", StructType(Seq(
        StructField("x", IntegerType))))))
    val schema = schemaToDescriptor(st, "graft.T")
    val ts = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-05-04T03:02:01.123456789Z"))
    val row = Row(42L, -7, "héllo ☃", 3.5d, 1.25f, true,
      Array[Byte](0, 1, -1), Seq("a", "b"), Seq(1L, -2L, 3L),
      Map("k1" -> 1L, "k2" -> 2L), ts, Row(9))
    val got = ProtoCodec.decode(schema, "graft.T",
      ProtoCodec.encode(schema, "graft.T", row))
    assert(got.getLong(0) === 42L)
    assert(got.getInt(1) === -7)
    assert(got.getString(2) === "héllo ☃")
    assert(got.getDouble(3) === 3.5d)
    assert(got.getFloat(4) === 1.25f)
    assert(got.getBoolean(5) === true)
    assert(got.getAs[Array[Byte]](6).toSeq === Seq[Byte](0, 1, -1))
    assert(got.getSeq[String](7) === Seq("a", "b"))
    assert(got.getSeq[Long](8) === Seq(1L, -2L, 3L))
    assert(got.getMap[String, Long](9) === Map("k1" -> 1L, "k2" -> 2L))
    assert(got.getAs[java.sql.Timestamp](10) === ts)
    assert(got.getStruct(11) === Row(9))
  }

  test("null fields are omitted on the wire and decode back to null") {
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val schema = schemaToDescriptor(st, "graft.T")
    val bytes = ProtoCodec.encode(schema, "graft.T", Row(null, null))
    assert(bytes.length === 0)
    assert(ProtoCodec.decode(schema, "graft.T", bytes) === Row(null, null))
  }

  test("packed repeated scalars decode AND encode (proto3 default " +
      "wire form)") {
    val schema = PbSchema(Map("P" -> PbMessage("P",
      Vector(PbField("v", 1, 3, TInt64, "")), mapEntry = false)),
      Map.empty)
    // hand-encode packed: tag(1,LEN) + len + varints 3,270,86942 (spec)
    val inner = new Writer
    Seq(3L, 270L, 86942L).foreach(inner.writeVarint)
    val w = new Writer
    w.writeTag(1, WtLen)
    w.writeBytes(inner.toByteArray)
    val got = ProtoCodec.decode(schema, "P", w.toByteArray)
    assert(got.getSeq[Long](0) === Seq(3L, 270L, 86942L))
    // our encoder emits the same packed bytes (the protoc default
    // for packable repeated scalars), byte-exact per the spec example
    assert(ProtoCodec.encode(schema, "P",
      Row(Seq(3L, 270L, 86942L))).toSeq === w.toByteArray.toSeq)
    // strings are NOT packable — repeated strings stay expanded
    val ss = PbSchema(Map("S" -> PbMessage("S",
      Vector(PbField("t", 1, 3, TString, "")), mapEntry = false)),
      Map.empty)
    val enc = ProtoCodec.encode(schema = ss, "S", Row(Seq("a", "b")))
    assert(ProtoCodec.decode(ss, "S", enc).getSeq[String](0) ===
      Seq("a", "b"))
    val exp = new Writer
    exp.writeTag(1, WtLen); exp.writeString("a")
    exp.writeTag(1, WtLen); exp.writeString("b")
    assert(enc.toSeq === exp.toByteArray.toSeq)
  }

  test("enums decode to symbols; sint/fixed variants roundtrip") {
    val schema = PbSchema(
      Map("M" -> PbMessage("M", Vector(
        PbField("color", 1, 1, TEnum, "Color"),
        PbField("s32", 2, 1, TSInt32, ""),
        PbField("s64", 3, 1, TSInt64, ""),
        PbField("f32", 4, 1, TSFixed32, ""),
        PbField("f64", 5, 1, TSFixed64, "")), mapEntry = false)),
      Map("Color" -> PbEnum("Color",
        Map(0 -> "RED", 1 -> "GREEN", 2 -> "BLUE"))))
    val row = Row("GREEN", -5, -6L, -7, -8L)
    val got = ProtoCodec.decode(schema, "M",
      ProtoCodec.encode(schema, "M", row))
    assert(got === Row("GREEN", -5, -6L, -7, -8L))
  }

  test("wrapper types unwrap to nullable scalars") {
    val schema = PbSchema(Map("W" -> PbMessage("W", Vector(
      PbField("s", 1, 1, TMessage, "google.protobuf.StringValue"),
      PbField("n", 2, 1, TMessage, "google.protobuf.Int64Value")),
      mapEntry = false)), Map.empty)
    assert(toStructType(schema, "W") === StructType(Seq(
      StructField("s", StringType), StructField("n", LongType))))
    val got = ProtoCodec.decode(schema, "W",
      ProtoCodec.encode(schema, "W", Row("x", 5L)))
    assert(got === Row("x", 5L))
  }

  test("a field whose wire type disagrees with the descriptor is " +
      "skipped as unknown, not misread") {
    // declared: a:int32(1), b:string(2). A foreign writer (schema
    // evolution / reused field number) sends field 1 length-delimited.
    // protobuf-java treats the mismatch as an unknown field; reading
    // it as varint would desync the stream and corrupt field 2.
    val schema = PbSchema(Map("M" -> PbMessage("M", Vector(
      PbField("a", 1, 1, TInt32, ""),
      PbField("b", 2, 1, TString, "")), mapEntry = false)), Map.empty)
    val w = new Writer
    w.writeTag(1, WtLen)
    w.writeBytes("xyz".getBytes("UTF-8"))
    w.writeTag(2, WtLen)
    w.writeBytes("ok".getBytes("UTF-8"))
    assert(ProtoCodec.decode(schema, "M", w.toByteArray) ===
      Row(null, "ok"))
    // reverse direction: a string field arriving as varint
    val w2 = new Writer
    w2.writeTag(2, WtVarint)
    w2.writeVarint(150L)
    w2.writeTag(1, WtVarint)
    w2.writeVarint(7L)
    assert(ProtoCodec.decode(schema, "M", w2.toByteArray) ===
      Row(7, null))
    // repeated packable accepts BOTH its scalar wire type and LEN
    // (packed), but skips anything else (here fixed32 for an int64)
    val rep = PbSchema(Map("P" -> PbMessage("P",
      Vector(PbField("v", 1, 3, TInt64, "")), mapEntry = false)),
      Map.empty)
    val w3 = new Writer
    w3.writeTag(1, ProtoWire.WtFixed32)
    w3.writeFixed32(99)
    w3.writeTag(1, WtVarint)
    w3.writeVarint(5L)
    assert(ProtoCodec.decode(rep, "P", w3.toByteArray)
      .getSeq[Long](0) === Seq(5L))
    // wrapper value field with wrong wire type decodes to null
    val ws = PbSchema(Map("W" -> PbMessage("W", Vector(
      PbField("n", 1, 1, TMessage, "google.protobuf.Int64Value")),
      mapEntry = false)), Map.empty)
    val inner = new Writer
    inner.writeTag(1, WtLen)
    inner.writeBytes("zz".getBytes("UTF-8"))
    val w4 = new Writer
    w4.writeTag(1, WtLen)
    w4.writeBytes(inner.toByteArray)
    assert(ProtoCodec.decode(ws, "W", w4.toByteArray) === Row(null))
  }

  test("RowDecoderFn nulls out garbage bytes instead of throwing") {
    val st = StructType(Seq(StructField("id", LongType)))
    val schema = schemaToDescriptor(st, "graft.T")
    val fn = new RowDecoderFn(toDescriptorSetBytes(schema), "graft.T")
    assert(fn.decode(Array[Byte](0x08, -1)) === null) // truncated varint
    assert(fn.decode(null) === null)
    // truncated fixed64 under an UNKNOWN field number must flag bad
    // too (skip() used to walk past the end silently)
    val w = new Writer
    w.writeTag(99, ProtoWire.WtFixed64)
    val bytes = w.toByteArray ++ Array[Byte](1, 2, 3) // 3 of 8 bytes
    assert(fn.decode(bytes) === null)
  }

  test("descriptorFile encode aligns columns to message fields by " +
      "NAME, not position") {
    // message declares (id=1, name=2); serialize selects [name, id] —
    // reversed. Positional pairing would write the name string under
    // field 1 and the id under field 2.
    val schema = PbSchema(Map("graft.R" -> PbMessage("graft.R", Vector(
      PbField("id", 1, 1, TInt64, ""),
      PbField("name", 2, 1, TString, "")), mapEntry = false)),
      Map.empty)
    val descPath = java.nio.file.Files
      .createTempDirectory("protoalign").resolve("r.desc")
    java.nio.file.Files.write(descPath, toDescriptorSetBytes(schema))
    val out = Pipeline.build(spark, s"""
      |sources:
      |  - name: src
      |    module: create
      |    parameters:
      |      elements: [{id: 7, name: x}]
      |      schema:
      |        fields:
      |          - {name: id, type: int64}
      |          - {name: name, type: string}
      |transforms:
      |  - name: ser
      |    module: serialize
      |    inputs: [src]
      |    parameters:
      |      format: protobuf
      |      descriptorFile: "$descPath"
      |      messageName: graft.R
      |      fields: [name, id]
      |      outputField: payload
      |""".stripMargin)("ser")
    val payload = out.select("payload").head.getAs[Array[Byte]](0)
    assert(ProtoCodec.decode(schema, "graft.R", payload) ===
      Row(7L, "x"))
    // a selected column missing from the message raises at build time
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: src
        |    module: create
        |    parameters:
        |      elements: [{id: 7, oops: y}]
        |      schema:
        |        fields:
        |          - {name: id, type: int64}
        |          - {name: oops, type: string}
        |transforms:
        |  - name: ser
        |    module: serialize
        |    inputs: [src]
        |    parameters:
        |      format: protobuf
        |      descriptorFile: "$descPath"
        |      messageName: graft.R
        |      fields: [id, oops]
        |      outputField: payload
        |""".stripMargin)
    }
    assert(e.getMessage.contains("'oops' is not in message"))
  }

  test("serialize -> deserialize protobuf pipeline roundtrip " +
      "(schema-derived descriptor)") {
    val out = Pipeline.build(spark, s"""
      |sources:
      |  - name: orders
      |    module: storage
      |    parameters: {path: "/root/testdata/sf0.001/orders.parquet"}
      |transforms:
      |  - name: ser
      |    module: serialize
      |    inputs: [orders]
      |    parameters:
      |      format: protobuf
      |      fields: [o_orderkey, o_orderstatus, o_totalprice]
      |      outputField: payload
      |  - name: keep
      |    module: sql
      |    inputs: [ser]
      |    parameters: {sql: "SELECT payload FROM ser"}
      |  - name: de
      |    module: deserialize
      |    inputs: [keep]
      |    parameters:
      |      format: protobuf
      |      field: payload
      |      outputField: rec
      |      schema:
      |        fields:
      |          - {name: o_orderkey, type: int64}
      |          - {name: o_orderstatus, type: string}
      |          - {name: o_totalprice, type: float64}
      |""".stripMargin)("de")
    val orig = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    assert(out.filter(org.apache.spark.sql.functions.col("__bad")).count() === 0)
    assert(out.count() === orig.count())
    val a = out.selectExpr("sum(rec.o_orderkey)", "sum(rec.o_totalprice)")
      .head
    val b = orig.selectExpr("sum(o_orderkey)", "sum(o_totalprice)").head
    assert(a.getLong(0) === b.getLong(0))
    // the roundtrip is bit-exact per value, but widen() repartitions
    // change double SUMMATION order — compare with an ulp-scale band
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) <
      math.ulp(b.getDouble(1)) * 64)
  }

  // ----- foreign interop fixture ----------------------------------
  // Descriptor set + message bytes hand-derived from the PUBLIC wire
  // spec (protobuf.dev encoding docs + descriptor.proto field
  // numbers) with test-local byte builders — deliberately NOT
  // produced by ProtoWire/ProtoCodec, so the decoder is pinned
  // against an independent construction of the format, the way
  // protoc-generated data would exercise it.
  private def fvint(n: Long): Array[Byte] = {
    var v = n
    val b = scala.collection.mutable.ArrayBuffer[Byte]()
    while ((v & ~0x7fL) != 0) { b += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    b += v.toByte
    b.toArray
  }
  private def ftag(f: Int, wt: Int): Array[Byte] = fvint((f << 3) | wt)
  private def fld(f: Int, b: Array[Byte]): Array[Byte] =
    ftag(f, 2) ++ fvint(b.length) ++ b
  private def fstr(f: Int, s: String): Array[Byte] =
    fld(f, s.getBytes("UTF-8"))
  private def fvar(f: Int, n: Long): Array[Byte] = ftag(f, 0) ++ fvint(n)

  /** syntax=proto3; package fix;
    * message Event { int64 id=1; string name=2; repeated int32
    *   values=3; Inner inner=4; map<string,int64> attrs=5;
    *   Color color=6; }
    * message Inner { double score=1; }
    * enum Color { RED=0; GREEN=1; } */
  private lazy val foreignDescriptorSet: Array[Byte] = {
    // FieldDescriptorProto: name=1 number=3 label=4 type=5 type_name=6
    def field(name: String, num: Int, label: Int, tpe: Int,
        typeName: String = ""): Array[Byte] =
      fstr(1, name) ++ fvar(3, num) ++ fvar(4, label) ++ fvar(5, tpe) ++
        (if (typeName.isEmpty) Array.empty[Byte] else fstr(6, typeName))
    // map<string,int64> compiles to nested AttrsEntry with
    // MessageOptions(7).map_entry(7)=true
    val attrsEntry = fstr(1, "AttrsEntry") ++
      fld(2, field("key", 1, 1, 9)) ++    // TYPE_STRING=9
      fld(2, field("value", 2, 1, 3)) ++  // TYPE_INT64=3
      fld(7, fvar(7, 1))
    val event = fstr(1, "Event") ++
      fld(2, field("id", 1, 1, 3)) ++
      fld(2, field("name", 2, 1, 9)) ++
      fld(2, field("values", 3, 3, 5)) ++ // LABEL_REPEATED=3, TYPE_INT32=5
      fld(2, field("inner", 4, 1, 11, ".fix.Inner")) ++
      fld(2, field("attrs", 5, 3, 11, ".fix.Event.AttrsEntry")) ++
      fld(2, field("color", 6, 1, 14, ".fix.Color")) ++
      fld(3, attrsEntry) // nested_type=3
    val inner = fstr(1, "Inner") ++
      fld(2, field("score", 1, 1, 1)) // TYPE_DOUBLE=1
    val color = fstr(1, "Color") ++
      fld(2, fstr(1, "RED") ++ fvar(2, 0)) ++
      fld(2, fstr(1, "GREEN") ++ fvar(2, 1))
    // FileDescriptorProto: name=1 package=2 message_type=4 enum_type=5
    // syntax=12; FileDescriptorSet: file=1
    val file = fstr(1, "fixture.proto") ++ fstr(2, "fix") ++
      fld(4, event) ++ fld(4, inner) ++ fld(5, color) ++
      fstr(12, "proto3")
    fld(1, file)
  }

  test("foreign descriptor-set fixture parses to the expected schema " +
      "and its message bytes decode exactly") {
    val schema = parseDescriptorSet(foreignDescriptorSet)
    assert(toStructType(schema, "fix.Event") === StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("values", ArrayType(IntegerType)),
      StructField("inner", StructType(Seq(
        StructField("score", DoubleType)))),
      StructField("attrs", MapType(StringType, LongType)),
      StructField("color", StringType))))
    // Event{id=150, name="héllo", values=[3,270,86942] PACKED,
    // inner={score=1.5}, attrs={"a":1}, color=GREEN} — field bytes
    // laid out per the spec's worked examples (150 -> 0x96 0x01;
    // packed run 3,270,86942 -> 03 8e 02 9e a7 05; 1.5 double ->
    // little-endian 0x3FF8000000000000)
    val msg =
      fvar(1, 150L) ++
      fstr(2, "héllo") ++
      fld(3, Array[Byte](0x03, 0x8e.toByte, 0x02, 0x9e.toByte,
        0xa7.toByte, 0x05)) ++
      fld(4, ftag(1, 1) ++ Array[Byte](0, 0, 0, 0, 0, 0,
        0xf8.toByte, 0x3f)) ++
      fld(5, fstr(1, "a") ++ fvar(2, 1L)) ++
      fvar(6, 1L)
    val row = ProtoCodec.decode(schema, "fix.Event", msg)
    assert(row.getLong(0) === 150L)
    assert(row.getString(1) === "héllo")
    assert(row.getSeq[Int](2) === Seq(3, 270, 86942))
    assert(row.getStruct(3) === Row(1.5d))
    assert(row.getMap[String, Long](4) === Map("a" -> 1L))
    assert(row.getString(5) === "GREEN")
    // and the codec's own encode of that row replays to the same row
    val again = ProtoCodec.decode(schema, "fix.Event",
      ProtoCodec.encode(schema, "fix.Event", row))
    assert(again === row)
  }

  test("descriptorFile path: export, read back through the module") {
    val st = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val schema = schemaToDescriptor(st, "graft.test.Doc")
    val descPath = java.nio.file.Files
      .createTempDirectory("protodesc").resolve("doc.desc")
    java.nio.file.Files.write(descPath, toDescriptorSetBytes(schema))
    val out = Pipeline.build(spark, s"""
      |sources:
      |  - name: src
      |    module: create
      |    parameters:
      |      elements:
      |        - {id: 1, name: a}
      |        - {id: 2, name: b}
      |      schema:
      |        fields:
      |          - {name: id, type: int64}
      |          - {name: name, type: string}
      |transforms:
      |  - name: ser
      |    module: serialize
      |    inputs: [src]
      |    parameters:
      |      format: protobuf
      |      descriptorFile: "$descPath"
      |      messageName: graft.test.Doc
      |      outputField: payload
      |  - name: de
      |    module: deserialize
      |    inputs: [ser]
      |    parameters:
      |      format: protobuf
      |      descriptorFile: "$descPath"
      |      messageName: graft.test.Doc
      |      field: payload
      |      outputField: rec
      |""".stripMargin)("de")
    val rows = out.selectExpr("rec.id", "rec.name").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows === Seq((1L, "a"), (2L, "b")))
    // unknown message name fails at build time, listing what exists
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: src
        |    module: create
        |    parameters:
        |      elements: [{id: 1}]
        |      schema: {fields: [{name: id, type: int64}]}
        |transforms:
        |  - name: ser
        |    module: serialize
        |    inputs: [src]
        |    parameters:
        |      format: protobuf
        |      descriptorFile: "$descPath"
        |      messageName: graft.test.Nope
        |      outputField: payload
        |""".stripMargin)
    }
    assert(e.getMessage.contains("graft.test.Doc"))
  }
}
