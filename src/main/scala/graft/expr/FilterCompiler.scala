package graft.expr

import com.fasterxml.jackson.databind.JsonNode
import graft.config.Json._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles the reference's JSON filter-condition tree to a Catalyst
  * `Column` predicate (mercari/pipeline `util/pipeline/Filter.java`).
  *
  * Shape: an array is an implicit AND of leaves; `{and:[...]}` /
  * `{or:[...]}` nodes nest (`Filter.java:303-342`). Leaves are
  * `{key|expression, op, value}` with ops
  * `= == != > >= < <= in "not in" match true false`
  * (`Filter.java:91-102`).
  *
  * Null/NaN semantics (`Filter.java:478-541`) differ from SQL
  * three-valued logic and are reproduced exactly:
  *  - null field value: only `=` against a null literal matches
  *  - non-null field, null literal: only `!=` matches
  *  - NaN / Infinity values: comparison yields false for EVERY op
  *  - `match` is java.util.regex `.find()` → unanchored `rlike`
  *  - `in`/`not in` compare on string form of the value
  */
object FilterCompiler {

  def compile(node: JsonNode, schema: StructType): Column = {
    if (node == null || node.isNull) return lit(true)
    compileNode(node, schema)
  }

  private def compileNode(node: JsonNode, schema: StructType): Column = {
    if (node.isArray) {
      // implicit AND; empty bits → false (Filter.java:464-466)
      val bits = node.elems.map(compileNode(_, schema))
      if (bits.isEmpty) lit(false) else bits.reduce(_ && _)
    } else if (node.isObject) {
      (node("and"), node("or")) match {
        case (Some(ands), _) =>
          val bits = ands.elems.map(compileNode(_, schema))
          if (bits.isEmpty) lit(false) else bits.reduce(_ && _)
        case (_, Some(ors)) =>
          val bits = ors.elems.map(compileNode(_, schema))
          if (bits.isEmpty) lit(false) else bits.reduce(_ || _)
        case _ => compileLeaf(node, schema)
      }
    } else throw new IllegalArgumentException(s"bad filter node: $node")
  }

  private def compileLeaf(node: JsonNode, schema: StructType): Column = {
    val op = node.str("op").getOrElse(
      throw new IllegalArgumentException(s"filter leaf requires op: $node"))
    val valueNode = node("value").orNull

    node.str("expression") match {
      case Some(exprText) =>
        // expression leaf: evaluate to double (NaN→null), compare
        val v = ExprCompiler.toNullable(
          ExprCompiler.compile(exprText, schema))
        leafPredicate(v, DoubleType, op, valueNode)
      case None =>
        val key = node.str("key").getOrElse(
          throw new IllegalArgumentException(
            s"filter leaf requires key or expression: $node"))
        // dotted path into nested structs, as ElementSchemaUtil.getValue
        val dt = resolvePath(schema, key)
        leafPredicate(col(key), dt, op, valueNode)
    }
  }

  private def resolvePath(schema: StructType, path: String): DataType = {
    def go(dt: DataType, parts: List[String]): DataType = (dt, parts) match {
      case (t, Nil) => t
      case (s: StructType, p :: rest) =>
        s.find(_.name == p).map(f => go(f.dataType, rest))
          .getOrElse(StringType)
      case _ => StringType
    }
    go(schema, path.split('.').toList)
  }

  /** One leaf: `col op value` with reference null/NaN rules. */
  def leafPredicate(c: Column, dt: DataType, op: String,
      valueNode: JsonNode): Column = {
    val valueIsNull = valueNode == null || valueNode.isNull
    val opNorm = op.trim.toLowerCase(java.util.Locale.ROOT)

    if (valueIsNull) return opNorm match {
      case "=" | "==" => c.isNull
      case "!=" => c.isNotNull
      case _ => lit(false)
    }

    opNorm match {
      case "true" => c.isNotNull // non-null value → TRUE op is true
      case "false" => lit(false)
      case "in" | "not in" | "not_in" =>
        val items = valueNode.elems.map(_.asText)
        val in = c.cast(StringType).isin(items: _*)
        if (opNorm == "in") in else !in // null → null ≡ false in WHERE
      case "match" =>
        c.cast(StringType).rlike(valueNode.asText)
      case cmp =>
        val litV = typedLit(dt, valueNode)
        val base = cmp match {
          case "=" | "==" => c === litV
          case "!=" => c =!= litV
          case ">" => c > litV
          case ">=" => c >= litV
          case "<" => c < litV
          case "<=" => c <= litV
          case other =>
            throw new IllegalArgumentException(s"unknown filter op $other")
        }
        // NaN/Infinity → every op false (Filter.java:507-511: c=-2 →
        // |c|>1 shortcut → `c > 0` → false). The plain comparison stays
        // first in the conjunction so Catalyst can push IT to the scan;
        // the isnan guards run post-scan. Null field → SQL null, which
        // every consumer treats as false (WHERE / when()); we do NOT
        // coalesce here because that wrapper blocks parquet pushdown.
        // Negation sites (nullif) must coalesce before applying `!`.
        dt match {
          case DoubleType | FloatType =>
            base && !isnan(c) &&
              c =!= lit(Double.PositiveInfinity) &&
              c =!= lit(Double.NegativeInfinity)
          case _ => base
        }
    }
  }

  /** Literal for comparison, typed to the column side like the
    * reference's typed compare (`Filter.java:502-518`). */
  private def typedLit(dt: DataType, v: JsonNode): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      lit(v.asLong)
    case FloatType | DoubleType => lit(v.asDouble)
    case _: DecimalType => lit(new java.math.BigDecimal(v.asText))
    case BooleanType => lit(v.asBoolean)
    case TimestampType | TimestampNTZType =>
      to_timestamp(lit(v.asText)).cast(dt)
    case DateType => to_date(lit(v.asText))
    case _ => lit(v.asText)
  }
}
