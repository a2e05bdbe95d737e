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
  * one element-wise sum/mean per group. The buffer is a single O(d)
  * double array plus a count — a mergeable partial aggregate, so
  * map-side combine applies like every built-in agg and only one
  * d-length vector per (partition, group) ever shuffles. Null rows
  * are skipped (condition guards compile to `when(cond, v)` → null);
  * null ELEMENTS count as 0.0 toward the sum but the row still
  * counts toward the mean's denominator. Mismatched dimensions fail
  * loudly — silently truncating or padding an embedding column hides
  * upstream corruption.
  */
object VectorFunctions {

  private def add(sums: Array[Double], v: Seq[java.lang.Double],
      label: String): Array[Double] = {
    if (sums == null) {
      val a = new Array[Double](v.size)
      var i = 0
      while (i < a.length) {
        val x = v(i); if (x != null) a(i) = x.doubleValue; i += 1
      }
      a
    } else {
      require(sums.length == v.size,
        s"$label: vector dimension mismatch in group — " +
          s"saw ${sums.length} then ${v.size}")
      var i = 0
      while (i < sums.length) {
        val x = v(i); if (x != null) sums(i) += x.doubleValue; i += 1
      }
      sums
    }
  }

  private def addArrays(a: Array[Double], b: Array[Double],
      label: String): Array[Double] = {
    if (a == null) return b
    if (b == null) return a
    require(a.length == b.length,
      s"$label: vector dimension mismatch across partitions — " +
        s"${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  private class VecAgg(mean: Boolean, label: String,
      bufEnc: Encoder[(Array[Double], Long)],
      outEnc: Encoder[Seq[Double]])
    extends Aggregator[Seq[java.lang.Double],
      (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (null, 0L)
    def reduce(b: (Array[Double], Long), v: Seq[java.lang.Double])
        : (Array[Double], Long) =
      if (v == null) b else (add(b._1, v, label), b._2 + 1)
    def merge(b1: (Array[Double], Long), b2: (Array[Double], Long))
        : (Array[Double], Long) =
      (addArrays(b1._1, b2._1, label), b1._2 + b2._2)
    def finish(b: (Array[Double], Long)): Seq[Double] =
      if (b._1 == null) null
      else if (mean) b._1.toSeq.map(_ / b._2)
      else b._1.toSeq
    def bufferEncoder: Encoder[(Array[Double], Long)] = bufEnc
    def outputEncoder: Encoder[Seq[Double]] = outEnc
  }

  private def agg(value: Column, mean: Boolean, label: String): Column =
    udaf(new VecAgg(mean, label,
      ExpressionEncoder[(Array[Double], Long)](),
      ExpressionEncoder[Seq[Double]]()),
      ExpressionEncoder[Seq[java.lang.Double]]())(value)

  /** Element-wise sum of an `array<double>` column per group. */
  def vectorSum(value: Column, label: String = "vector_sum"): Column =
    agg(value, mean = false, label)

  /** Element-wise mean of an `array<double>` column per group
    * (mean-pooling). The denominator is the non-null ROW count. */
  def vectorAvg(value: Column, label: String = "vector_avg"): Column =
    agg(value, mean = true, label)
}
