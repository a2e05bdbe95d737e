package graft

import graft.ops.TFRecords
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord container + tf.Example codec (`ops/TFRecords`): framing
  * CRCs, the reference converter's type mapping, null/absent-feature
  * symmetry, and the storage-module roundtrip. */
class TFRecordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val allTypes = StructType(Seq(
    StructField("s", StringType), StructField("b", BinaryType),
    StructField("f", FloatType), StructField("d", DoubleType),
    StructField("i8", ByteType), StructField("i16", ShortType),
    StructField("i32", IntegerType), StructField("i64", LongType),
    StructField("bool", BooleanType),
    StructField("fs", ArrayType(FloatType)),
    StructField("ls", ArrayType(LongType)),
    StructField("ss", ArrayType(StringType))))

  test("tf.Example roundtrips every supported type exactly") {
    val row = Row("héllo", Array[Byte](1, -2, 3), 1.5f, 2.25d,
      7.toByte, (-300).toShort, -70000, 1L << 40, true,
      Seq(0.5f, -1.5f), Seq(-1L, 0L, Long.MaxValue), Seq("a", "ß"))
    val back = TFRecords.decodeExample(
      TFRecords.exampleBytes(row, allTypes), allTypes)
    assert(back.getString(0) == "héllo")
    assert(back.getAs[Array[Byte]](1).toSeq == Seq[Byte](1, -2, 3))
    assert(back.getFloat(2) == 1.5f)
    assert(back.getDouble(3) == 2.25d) // exactly float-representable
    assert(back.getByte(4) == 7.toByte)
    assert(back.getShort(5) == (-300).toShort)
    assert(back.getInt(6) == -70000)
    assert(back.getLong(7) == (1L << 40))
    assert(back.getBoolean(8))
    assert(back.getSeq[Float](9) == Seq(0.5f, -1.5f))
    assert(back.getSeq[Long](10) == Seq(-1L, 0L, Long.MaxValue))
    assert(back.getSeq[String](11) == Seq("a", "ß"))
  }

  test("null fields are skipped on encode and decode as null") {
    val st = StructType(Seq(StructField("a", LongType),
      StructField("missing", StringType)))
    val back = TFRecords.decodeExample(
      TFRecords.exampleBytes(Row(5L, null), st), st)
    assert(back.getLong(0) == 5L)
    assert(back.isNullAt(1))
  }

  test("double narrows to float32 on the wire (the reference " +
      "converter's mapping)") {
    val st = StructType(Seq(StructField("d", DoubleType)))
    val back = TFRecords.decodeExample(
      TFRecords.exampleBytes(Row(1234.56d), st), st)
    assert(back.getDouble(0) == 1234.56f.toDouble)
    assert(back.getDouble(0) != 1234.56d) // the documented loss
  }

  test("framing validates both CRCs and rejects corruption") {
    val payload = "payload".getBytes("UTF-8")
    val framed = TFRecords.frame(payload)
    def frames(b: Array[Byte]) = TFRecords.readFrames(
      new java.io.DataInputStream(new java.io.ByteArrayInputStream(b)))
    assert(frames(framed).toSeq.map(_.toSeq) == Seq(payload.toSeq))
    // flip one payload byte → data CRC mismatch
    val corrupt = framed.clone()
    corrupt(13) = (corrupt(13) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] {
      frames(corrupt).toSeq
    }
    assert(e.getMessage.contains("CRC"))
    // flip one length byte → length CRC mismatch
    val corruptLen = framed.clone()
    corruptLen(0) = (corruptLen(0) ^ 0x01).toByte
    val e2 = intercept[IllegalArgumentException] {
      frames(corruptLen).toSeq
    }
    assert(e2.getMessage.contains("CRC"))
  }

  test("unpacked float/int64 lists decode too (proto2 writers)") {
    // hand-build a Feature with UNPACKED encodings: float as fixed32
    // (wire type 5), int64 as plain varint (wire type 0)
    val fl = new graft.ops.ProtoWire.Writer
    fl.writeTag(1, 5)
    fl.writeFixed32(java.lang.Float.floatToIntBits(3.5f))
    val il = new graft.ops.ProtoWire.Writer
    il.writeTag(1, 0)
    il.writeVarint(42L)
    def feature(kind: Int, list: Array[Byte]): Array[Byte] = {
      val f = new graft.ops.ProtoWire.Writer
      f.writeTag(kind, 2); f.writeBytes(list); f.toByteArray
    }
    def example(name: String, feat: Array[Byte]): Array[Byte] = {
      val entry = new graft.ops.ProtoWire.Writer
      entry.writeTag(1, 2); entry.writeString(name)
      entry.writeTag(2, 2); entry.writeBytes(feat)
      val features = new graft.ops.ProtoWire.Writer
      features.writeTag(1, 2); features.writeBytes(entry.toByteArray)
      val ex = new graft.ops.ProtoWire.Writer
      ex.writeTag(1, 2); ex.writeBytes(features.toByteArray)
      ex.toByteArray
    }
    val stF = StructType(Seq(StructField("x", FloatType)))
    assert(TFRecords.decodeExample(
      example("x", feature(2, fl.toByteArray)), stF).getFloat(0) == 3.5f)
    val stL = StructType(Seq(StructField("n", LongType)))
    assert(TFRecords.decodeExample(
      example("n", feature(3, il.toByteArray)), stL).getLong(0) == 42L)
  }

  test("storage sink + source roundtrip tfrecord end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tfr")
      .toString
    Pipeline.execute(spark, s"""
      |sources:
      |  - name: emb
      |    module: storage
      |    parameters: {path: "/root/testdata/sf0.001/embeddings.parquet"}
      |sinks:
      |  - name: w
      |    module: storage
      |    input: emb
      |    parameters:
      |      output: "$dir/emb"
      |      format: tfrecord
      |      numShards: 4
      |""".stripMargin)
    // 4 shards → 4 files → 4 read tasks
    val files = new java.io.File(s"$dir/emb").listFiles()
      .filter(_.getName.endsWith(".tfrecord"))
    assert(files.length == 4)
    val back = Pipeline.build(spark, s"""
      |sources:
      |  - name: r
      |    module: storage
      |    parameters:
      |      path: "$dir/emb"
      |      format: tfrecord
      |      schema:
      |        fields:
      |          - {name: vec_id, type: int64}
      |          - {name: embedding, type: array, itemType: {type: float32}}
      |          - {name: label, type: int32}
      |""".stripMargin)("r")
    val orig = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(back.count() == orig.count())
    // float arrays roundtrip bit-exactly; compare full contents
    val a = back.orderBy("vec_id")
      .collect().map(r => (r.getLong(0),
        Option(r.getSeq[Float](1)).map(_.toList), r.getInt(2)))
    val b = orig.orderBy("vec_id")
      .collect().map(r => (r.getLong(0),
        Option(r.getSeq[Float](1)).map(_.toList), r.getInt(2)))
    assert(a.toSeq == b.toSeq)
    // missing schema on read fails actionably
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: r2
        |    module: storage
        |    parameters: {path: "$dir/emb", format: tfrecord}
        |""".stripMargin)
    }
    assert(e.getMessage.contains("schema"))
  }
}
