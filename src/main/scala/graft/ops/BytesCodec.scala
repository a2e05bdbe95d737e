package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** HBase `Bytes.toBytes`-style binary encode/decode for the
  * `bytes_encode`/`bytes_decode` select funcs (reference
  * `util/pipeline/select/Bytes.java` — big-endian fixed-width encodings).
  * Genuinely imperative byte-order work → small Scala UDFs, per the
  * SURVEY §4 guidance (UDF only where codegen expressions can't help).
  */
object BytesCodec {

  private def be(n: Int)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(n)
    f(b); b.array()
  }

  private val encLong = udf((v: java.lang.Long) =>
    if (v == null) null else be(8)(_.putLong(v)))
  private val encInt = udf((v: java.lang.Integer) =>
    if (v == null) null else be(4)(_.putInt(v)))
  private val encDouble = udf((v: java.lang.Double) =>
    if (v == null) null else be(8)(_.putDouble(v)))
  private val encFloat = udf((v: java.lang.Float) =>
    if (v == null) null else be(4)(_.putFloat(v)))
  private val encString = udf((v: String) =>
    if (v == null) null else v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private val encBool = udf((v: java.lang.Boolean) =>
    if (v == null) null else Array[Byte](if (v) -1 else 0)) // HBase style

  def encode(c: Column, dt: DataType): Column = dt match {
    case LongType => encLong(c)
    case IntegerType | ShortType | ByteType => encInt(c.cast(IntegerType))
    case DoubleType => encDouble(c)
    case FloatType => encFloat(c)
    case BooleanType => encBool(c)
    case BinaryType => c
    case _ => encString(c.cast(StringType))
  }

  private val decLong = udf((v: Array[Byte]) =>
    if (v == null || v.length < 8) null
    else java.lang.Long.valueOf(java.nio.ByteBuffer.wrap(v).getLong))
  private val decInt = udf((v: Array[Byte]) =>
    if (v == null || v.length < 4) null
    else java.lang.Integer.valueOf(java.nio.ByteBuffer.wrap(v).getInt))
  private val decDouble = udf((v: Array[Byte]) =>
    if (v == null || v.length < 8) null
    else java.lang.Double.valueOf(java.nio.ByteBuffer.wrap(v).getDouble))
  private val decFloat = udf((v: Array[Byte]) =>
    if (v == null || v.length < 4) null
    else java.lang.Float.valueOf(java.nio.ByteBuffer.wrap(v).getFloat))
  private val decString = udf((v: Array[Byte]) =>
    if (v == null) null
    else new String(v, java.nio.charset.StandardCharsets.UTF_8))

  private val decBool = udf((v: Array[Byte]) =>
    if (v == null || v.isEmpty) null
    else java.lang.Boolean.valueOf(v(0) != 0))

  def decode(c: Column, typeName: String): Column =
    typeName.toLowerCase(java.util.Locale.ROOT) match {
      case "int64" | "long" => decLong(c)
      case "int32" | "int" | "integer" => decInt(c)
      case "float64" | "double" => decDouble(c)
      case "float32" | "float" => decFloat(c)
      // without these two, boolean bytes (0xFF) fell through to the
      // UTF-8 branch and decoded as replacement-char garbage, and
      // binary payloads were silently mangled into strings
      case "bool" | "boolean" => decBool(c)
      case "bytes" | "binary" => c
      case _ => decString(c)
    }
}
