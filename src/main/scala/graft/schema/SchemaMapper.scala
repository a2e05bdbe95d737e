package graft.schema

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Json._
import org.apache.spark.sql.types._

/** Maps the reference's config type language to Spark SQL types.
  * Reference: mercari/pipeline `module/Schema.java:1107-1193` — types
  * `bool,string,json,bytes,int8..int64,float16..float64,decimal,date,
  * time,datetime,timestamp,enumeration,map,element,array(mode=repeated)`
  * with modes `nullable|required|repeated` (BigQuery style).
  */
object SchemaMapper {

  /** One config field: {name, type, mode?, fields?, valueType?, symbols?} */
  def toDataType(node: JsonNode): DataType = {
    val typeName = node.str("type").getOrElse(
      throw new IllegalArgumentException(s"field requires type: $node"))
    baseType(typeName, node)
  }

  def baseType(typeName: String, node: JsonNode): DataType =
    typeName.toLowerCase(java.util.Locale.ROOT) match {
      case "bool" | "boolean" => BooleanType
      case "string" | "json" | "geography" => StringType
      case "bytes" => BinaryType
      case "byte" | "int8" => ByteType
      case "int16" | "short" => ShortType
      case "int32" | "int" | "integer" => IntegerType
      case "int64" | "long" => LongType
      case "float16" | "float32" | "float" => FloatType
      case "float64" | "double" => DoubleType
      case "decimal" | "numeric" | "bignumeric" =>
        val p = math.min(node.int("precision").getOrElse(38), 38)
        val s = node.int("scale").getOrElse(9)
        DecimalType(p, math.min(s, p))
      case "date" => DateType
      case "time" => LongType // micros of day; Spark has no TimeType
      case "datetime" => TimestampNTZType
      case "timestamp" => TimestampType
      case "enumeration" => StringType
      case "map" =>
        val vt = node("valueType").map(toDataType).getOrElse(StringType)
        MapType(StringType, vt)
      case "element" | "struct" | "record" =>
        StructType(node.arrOf("fields").map(toStructField))
      case "array" =>
        // reference rejects type:array (Schema.java:659) — arrays are
        // mode:repeated; accept it anyway with itemType for ergonomics
        ArrayType(node("itemType").map(toDataType).getOrElse(StringType))
      case "matrix" =>
        // reference Schema.java:733 matrix(valueType, shape): one
        // nesting level per shape dimension; the shape itself rides
        // in column metadata (Spark arrays are unbounded) — see
        // toStructField
        val vt = node("matrixValueType").orElse(node("valueType"))
          .map(toDataType).getOrElse(FloatType)
        val shape = node.arrOf("shape").map(_.asInt)
        require(shape.nonEmpty, "matrix type requires shape: [dims...]")
        shape.foldLeft(vt)((t, _) => ArrayType(t))
      case other =>
        throw new IllegalArgumentException(s"unknown type: $other")
    }

  def toStructField(node: JsonNode): StructField = {
    val name = node.str("name").getOrElse(
      throw new IllegalArgumentException(s"field requires name: $node"))
    val mode = node.str("mode").getOrElse("nullable").toLowerCase(java.util.Locale.ROOT)
    val base = toDataType(node)
    // shape (matrix) and symbols (enumeration) are type REFINEMENTS
    // Spark's lattice can't carry — record them as column metadata so
    // downstream modules (reshape, validators) can read them back
    val mb = new MetadataBuilder()
    val shape = node.arrOf("shape").map(_.asLong)
    if (shape.nonEmpty) mb.putLongArray("shape", shape.toArray)
    val symbols = node.strArr("symbols")
    if (symbols.nonEmpty) mb.putStringArray("symbols", symbols.toArray)
    val meta = mb.build()
    mode match {
      case "repeated" =>
        StructField(name, ArrayType(base), nullable = true, meta)
      case "required" => StructField(name, base, nullable = false, meta)
      case _ => StructField(name, base, nullable = true, meta)
    }
  }

  /** Config `schema: {fields: [...]}` or bare `fields: [...]` → StructType */
  def toStructType(node: JsonNode): StructType = {
    val fields = node("fields").map(_.elems)
      .orElse(node("schema").flatMap(_.apply("fields")).map(_.elems))
      .getOrElse(node.elems)
    StructType(fields.map(toStructField))
  }
}
