package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared value normalization for sketch families whose distinct /
  * frequency identity is the STRING rendering of the value (theta,
  * count-min): the same logical number sketched from
  * differently-typed columns must render identically — int 1 → "1"
  * but double 1.0 → "1.0" would make a cross-corpus theta intersect
  * (or a cms estimate probed from an int column against a sketch
  * built over doubles) silently report ~0 with no diagnostic.
  * Integral types render as longs; fractional values that are exact
  * integers strip the trailing ".0"; everything else keeps its
  * natural string form.
  *
  * COMPATIBILITY: this normalization shipped in round 14 and CHANGED
  * the sketch identity for fractional-typed columns (double 1.0 was
  * previously rendered "1.0", now "1"). Theta/CMS sketches persisted
  * by pre-r14 builds over float/double/decimal columns use the old
  * rendering and carry no version marker — merging or intersecting
  * one with a new sketch silently undercounts. Rebuild persisted
  * sketches over fractional columns; sketches over string and
  * integral columns are unaffected (their rendering never changed).
  * README "Sketch identity" records the same contract. */
object SketchNorm {

  def normalize(dt: DataType, value: Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      value.cast(LongType).cast(StringType)
    case _: DecimalType =>
      // decimals stay in decimal arithmetic — a double round-trip
      // would silently merge keys above 2^53 (9007199254740993
      // renders as ...992); integral decimals render without the
      // fractional tail so they agree with the integral branch
      when(value.isNotNull && value === floor(value),
        value.cast(DecimalType(38, 0)).cast(StringType))
        .otherwise(value.cast(StringType))
    case FloatType | DoubleType =>
      val d = value.cast(DoubleType)
      // the long-range guard keeps the clamped non-ansi double→long
      // cast from matching huge doubles
      when(d.isNotNull && abs(d) < lit(9.0e18) &&
          d === d.cast(LongType).cast(DoubleType),
        d.cast(LongType).cast(StringType))
        .otherwise(d.cast(StringType))
    case _ => value.cast(StringType)
  }

  /** Resolve a (possibly dotted) field path against a schema — an
    * exact top-level name wins, then struct descent; StringType when
    * unresolved (normalization then falls through to the identity
    * cast). */
  def resolveType(schema: StructType, field: String): DataType = {
    def walk(dt: DataType, path: List[String]): Option[DataType] =
      (dt, path) match {
        case (t, Nil) => Some(t)
        case (s: StructType, h :: rest) =>
          s.fields.find(_.name == h).flatMap(f => walk(f.dataType, rest))
        case _ => None
      }
    schema.fields.find(_.name == field).map(_.dataType)
      .orElse(walk(schema, field.split('.').toList))
      .getOrElse(StringType)
  }
}
