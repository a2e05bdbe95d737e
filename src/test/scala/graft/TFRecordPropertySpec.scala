package graft

import graft.ops.TFRecords
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: for random flat schemas and random rows, frame +
  * tf.Example encode → readFrames + decode is the identity up to the
  * format's documented collapses — null == absent feature, double
  * narrows through float32, and empty arrays decode as empty. Pins
  * the framing CRCs, the feature field numbers, and the packed/
  * length-delimited list codecs together. */
class TFRecordPropertySpec extends AnyFunSuite {

  private val scalarGen: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, ShortType, ByteType, FloatType, DoubleType,
    BooleanType, StringType, BinaryType)

  private val elemGen: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, FloatType, DoubleType, BooleanType,
    StringType, BinaryType)

  private val schemaGen: Gen[StructType] =
    Gen.choose(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        5 -> scalarGen,
        2 -> elemGen.map(ArrayType(_)))).map(ts =>
        StructType(ts.zipWithIndex.map { case (t, i) =>
          StructField(s"f$i", t) })))

  private def scalarValueGen(dt: DataType): Gen[Any] = dt match {
    case LongType => Gen.frequency(
      1 -> Gen.oneOf(0L, -1L, Long.MaxValue, Long.MinValue),
      4 -> Gen.choose(Long.MinValue, Long.MaxValue))
    case IntegerType => Gen.choose(Int.MinValue, Int.MaxValue)
    case ShortType => Gen.choose(Short.MinValue, Short.MaxValue)
      .map(_.toShort)
    case ByteType => Gen.choose(Byte.MinValue, Byte.MaxValue)
      .map(_.toByte)
    case FloatType => Gen.frequency(
      1 -> Gen.oneOf[Any](0.0f, -0.0f, Float.NaN,
        Float.PositiveInfinity, Float.MinPositiveValue),
      4 -> Gen.choose(-1e6f, 1e6f))
    case DoubleType => Gen.choose(-1e6d, 1e6d)
    case BooleanType => Gen.oneOf(true, false)
    case StringType => Gen.frequency(
      1 -> Gen.const(""),
      1 -> Gen.const("héllo wörld 漢字 👍"),
      4 -> Gen.alphaNumStr)
    case BinaryType => Gen.listOf(Gen.choose(Byte.MinValue,
      Byte.MaxValue)).map(_.toArray)
    case other => throw new IllegalArgumentException(other.toString)
  }

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case ArrayType(et, _) => Gen.frequency(
      1 -> Gen.const(null),
      1 -> Gen.const(Seq.empty[Any]),
      4 -> Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, scalarValueGen(et)).map(_.toSeq)))
    case dt => Gen.frequency(
      1 -> Gen.const(null),
      5 -> scalarValueGen(dt))
  }

  private def rowGen(st: StructType): Gen[Row] =
    Gen.sequence[List[Any], Any](
      st.fields.toList.map(f => valueGen(f.dataType)))
      .map(vs => Row.fromSeq(vs))

  /** Expected decode of an encoded value: the format's documented
    * collapses applied. */
  private def expected(dt: DataType, v: Any): Any = (dt, v) match {
    case (_, null) => null
    case (DoubleType, d: Double) => d.toFloat.toDouble
    case (ArrayType(DoubleType, _), s: Seq[_]) =>
      s.map(x => x.asInstanceOf[Double].toFloat.toDouble)
    case (ArrayType(_, _), s: Seq[_]) if s.isEmpty =>
      // an empty list still writes its Feature (with an empty *List),
      // so it decodes as empty, not null
      Seq.empty[Any]
    case (_, v) => v
  }

  private def eq(dt: DataType, a: Any, b: Any): Boolean = (dt, a, b) match {
    case (_, null, null) => true
    case (_, null, _) | (_, _, null) => false
    case (BinaryType, x: Array[Byte], y: Array[Byte]) => x.sameElements(y)
    case (FloatType, x: Float, y: Float) =>
      (x.isNaN && y.isNaN) || x == y
    case (DoubleType, x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || x == y
    case (ArrayType(et, _), x: Seq[_], y: Seq[_]) =>
      x.length == y.length &&
        x.zip(y).forall { case (xa, ya) => eq(et, xa, ya) }
    case (_, x, y) => x == y
  }

  test("tfrecord frame + tf.Example roundtrip is the identity " +
      "(500 random cases)") {
    val caseGen = schemaGen.flatMap(st => rowGen(st).map((st, _)))
    val seed = org.scalacheck.rng.Seed(20260814L)
    var s = seed
    (1 to 500).foreach { i =>
      val (st, row) = caseGen.pureApply(Gen.Parameters.default, s)
      s = s.next
      val framed = TFRecords.frame(TFRecords.exampleBytes(row, st))
      val frames = TFRecords.readFrames(new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(framed))).toSeq
      assert(frames.size == 1, s"case $i: frame count")
      val back = TFRecords.decodeExample(frames.head, st)
      st.fields.zipWithIndex.foreach { case (f, fi) =>
        val want = expected(f.dataType, row.get(fi))
        val got = back.get(fi)
        assert(eq(f.dataType, got, want),
          s"case $i field ${f.name} (${f.dataType}): got $got, " +
            s"want $want (in ${row.get(fi)})")
      }
    }
  }
}
