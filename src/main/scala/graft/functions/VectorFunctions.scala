package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector aggregation (parity-plus: the reference has no
  * vector aggregate; the pipeline-level need is pooling — averaging
  * chunk embeddings into a document embedding, summing gradient-like
  * per-example vectors, computing cluster centroids from assigned
  * members without a k-means fit).
  *
  * `vectorSum` / `vectorAvg` accumulate `array<double>` columns into
  * one element-wise sum/mean per group. The buffer is an O(d) double
  * array plus an O(d) per-position count array — a mergeable partial
  * aggregate, so map-side combine applies like every built-in agg and
  * only one d-length buffer per (partition, group) ever shuffles.
  * Null ROWS are skipped (condition guards compile to
  * `when(cond, v)` → null). Null ELEMENTS follow SQL aggregate
  * semantics PER POSITION: they are excluded from that position's
  * mean denominator, and a position with no non-null contribution
  * yields a null element (sum emits 0.0 there, matching "adds
  * nothing"). Mismatched dimensions fail loudly — silently
  * truncating or padding an embedding column hides upstream
  * corruption.
  */
object VectorFunctions {

  private type Buf = (Array[Double], Array[Long])

  private class VecAgg(mean: Boolean, label: String,
      bufEnc: Encoder[Buf],
      outEnc: Encoder[Seq[java.lang.Double]])
    extends Aggregator[Seq[java.lang.Double], Buf,
      Seq[java.lang.Double]] {
    def zero: Buf = (null, null)
    def reduce(b: Buf, v: Seq[java.lang.Double]): Buf =
      if (v == null) b
      else {
        val (s0, c0) = b
        val (s, c) =
          if (s0 == null)
            (new Array[Double](v.size), new Array[Long](v.size))
          else (s0, c0)
        require(s.length == v.size,
          s"$label: vector dimension mismatch in group — " +
            s"saw ${s.length} then ${v.size}")
        var i = 0
        while (i < s.length) {
          val x = v(i)
          if (x != null) { s(i) += x.doubleValue; c(i) += 1L }
          i += 1
        }
        (s, c)
      }
    def merge(b1: Buf, b2: Buf): Buf =
      if (b1._1 == null) b2
      else if (b2._1 == null) b1
      else {
        require(b1._1.length == b2._1.length,
          s"$label: vector dimension mismatch across partitions — " +
            s"${b1._1.length} vs ${b2._1.length}")
        var i = 0
        while (i < b1._1.length) {
          b1._1(i) += b2._1(i); b1._2(i) += b2._2(i); i += 1
        }
        b1
      }
    def finish(b: Buf): Seq[java.lang.Double] =
      if (b._1 == null) null
      else {
        val out = new Array[java.lang.Double](b._1.length)
        var i = 0
        while (i < out.length) {
          out(i) =
            if (!mean) java.lang.Double.valueOf(b._1(i))
            else if (b._2(i) == 0L) null
            else java.lang.Double.valueOf(b._1(i) / b._2(i))
          i += 1
        }
        out.toSeq
      }
    def bufferEncoder: Encoder[Buf] = bufEnc
    def outputEncoder: Encoder[Seq[java.lang.Double]] = outEnc
  }

  private def agg(value: Column, mean: Boolean, label: String): Column =
    udaf(new VecAgg(mean, label,
      ExpressionEncoder[Buf](),
      ExpressionEncoder[Seq[java.lang.Double]]()),
      ExpressionEncoder[Seq[java.lang.Double]]())(value)

  /** Element-wise sum of an `array<double>` column per group. */
  def vectorSum(value: Column, label: String = "vector_sum"): Column =
    agg(value, mean = false, label)

  /** Element-wise mean of an `array<double>` column per group
    * (mean-pooling); each position's denominator is that position's
    * non-null element count. */
  def vectorAvg(value: Column, label: String = "vector_avg"): Column =
    agg(value, mean = true, label)
}
