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
  * natural string form. */
object SketchNorm {

  def normalize(dt: DataType, value: Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      value.cast(LongType).cast(StringType)
    case FloatType | DoubleType | _: DecimalType =>
      val d = value.cast(DoubleType)
      // the long-range guard keeps the clamped non-ansi double→long
      // cast from matching huge doubles
      when(d.isNotNull && abs(d) < lit(9.0e18) &&
          d === d.cast(LongType).cast(DoubleType),
        d.cast(LongType).cast(StringType))
        .otherwise(d.cast(StringType))
    case _ => value.cast(StringType)
  }
}
