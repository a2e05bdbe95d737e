package graft

import graft.ops.AvroCodec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: the raw-binary avro roundtrip (schema →
  * canonically-nullable avro schema → encode → decode) is the exact
  * identity — unlike proto3 there is no absent-vs-default collapse:
  * every field is union[null, T], so nulls, zeros, empty strings,
  * empty arrays and empty maps all survive bit-for-bit. */
class AvroPropertySpec extends AnyFunSuite {

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, DoubleType, FloatType, BooleanType,
    StringType, BinaryType, TimestampType)

  private def fieldTypeGen(depth: Int): Gen[DataType] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      6 -> scalarGen,
      2 -> scalarGen.map(ArrayType(_)),
      1 -> scalarGen.map(MapType(StringType, _)),
      2 -> Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, fieldTypeGen(depth - 1)).map(ts =>
          StructType(ts.zipWithIndex.map { case (t, i) =>
            StructField(s"n$i", t) }))))

  private val schemaGen: Gen[StructType] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, fieldTypeGen(2)).map(ts =>
        StructType(ts.zipWithIndex.map { case (t, i) =>
          StructField(s"f$i", t) })))

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case LongType => Gen.frequency(
      1 -> Gen.const(null),
      1 -> Gen.oneOf(0L, -1L, Long.MaxValue, Long.MinValue),
      4 -> Gen.choose(Long.MinValue, Long.MaxValue))
    case IntegerType => Gen.frequency(
      1 -> Gen.const(null),
      4 -> Gen.choose(Int.MinValue, Int.MaxValue))
    case DoubleType => Gen.frequency(
      1 -> Gen.const(null),
      1 -> Gen.oneOf[Any](0.0d, -0.0d, Double.NaN),
      4 -> Gen.choose(-1e12d, 1e12d))
    case FloatType => Gen.frequency(
      1 -> Gen.const(null),
      4 -> Gen.choose(-1e6f, 1e6f))
    case BooleanType => Gen.oneOf[Any](null, true, false)
    case StringType => Gen.frequency(
      1 -> Gen.const(null),
      1 -> Gen.oneOf[Any]("", "héllo ☃ 日本語"),
      4 -> Gen.alphaNumStr.map(_.take(20)))
    case BinaryType => Gen.frequency(
      1 -> Gen.const(null),
      4 -> Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.take(16).toArray))
    case TimestampType => Gen.frequency(
      1 -> Gen.const(null),
      4 -> Gen.choose(-8e15.toLong, 8e15.toLong).map(ms =>
        java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(ms))))
    case ArrayType(et, _) => Gen.frequency(
      1 -> Gen.const(null),
      1 -> Gen.const(Seq.empty[Any]),
      4 -> Gen.choose(1, 4).flatMap(n =>
        Gen.listOfN(n, valueGen(et)).map(_.toSeq)))
    case MapType(_, vt, _) => Gen.frequency(
      1 -> Gen.const(null),
      1 -> Gen.const(Map.empty[String, Any]),
      4 -> Gen.choose(1, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.identifier.map(_.take(8)),
          valueGen(vt))).map(_.toMap)))
    case st: StructType => Gen.frequency(
      1 -> Gen.const(null),
      4 -> rowGen(st))
    case other => throw new IllegalArgumentException(other.toString)
  }

  private def rowGen(st: StructType): Gen[Row] =
    Gen.sequence[List[Any], Any](st.fields.toList.map(f =>
      valueGen(f.dataType))).map(Row.fromSeq(_))

  private def eq(a: Any, b: Any, dt: DataType): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (x: Double, y: Double) =>
      java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y)
    case (x: Float, y: Float) =>
      java.lang.Float.floatToIntBits(x) == java.lang.Float.floatToIntBits(y)
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      val et = dt.asInstanceOf[ArrayType].elementType
      x.length == y.length &&
        x.zip(y).forall { case (p, q) => eq(p, q, et) }
    case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
      val vt = dt.asInstanceOf[MapType].valueType
      x.keySet == y.keySet && x.forall { case (k, v) =>
        eq(v, y.asInstanceOf[scala.collection.Map[Any, Any]](k), vt) }
    case (x: Row, y: Row) =>
      val st = dt.asInstanceOf[StructType]
      x.length == y.length && st.fields.toSeq.zipWithIndex.forall {
        case (f, i) => eq(x.get(i), y.get(i), f.dataType) }
    case (x, y) => x == y
  }

  test("avro binary roundtrip is the exact identity, 300 random " +
      "schema×row cases") {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(1337L)
    var i = 0
    while (i < 300) {
      val st = schemaGen.pureApply(params, seed)
      seed = seed.next
      val row = rowGen(st).pureApply(params, seed)
      seed = seed.next
      val json = AvroCodec.toAvroSchema(st).toString
      val encFn = new AvroCodec.RowEncoderFn(st, json)
      val decFn = new AvroCodec.RowDecoderFn(json)
      // derived struct must agree with the source modulo nullability
      assert(decFn.structType.fields.map(f => (f.name, f.dataType))
        .toSeq === st.fields.map(f => (f.name, f.dataType)).toSeq)
      val got = decFn.decode(encFn.encode(row))
      assert(got != null && eq(got, row, st),
        s"case $i\nschema: $st\nrow: $row\ngot: $got")
      i += 1
    }
  }
}
