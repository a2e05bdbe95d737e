package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation for similarity search.
  *
  * Replaces `row_number().over(Window.partitionBy(query))` — which
  * funnels every scored candidate of a query into ONE partition —
  * with a partial-aggregating UDAF: the hash aggregate keeps at most
  * `cap` candidates per (partition, query) map-side, so the shuffle
  * carries O(partitions × queries × k) rows instead of the whole
  * scored corpus. At 100 TB brute-force this is the difference
  * between one task holding the corpus and a bounded merge.
  *
  * Ordering matches Spark's window semantics exactly: score
  * descending with NaN largest (java.lang.Double.compare), ties
  * broken by id ascending.
  */
object TopKFunctions {

  /** Buffer/output element: (score, id). Kept as tuples so the
    * ExpressionEncoder-derived buffer stays codegen-friendly. */
  private def ord[I](implicit idOrd: Ordering[I]): Ordering[(Double, I)] =
    new Ordering[(Double, I)] {
      def compare(a: (Double, I), b: (Double, I)): Int = {
        // descending score, NaN treated as largest (Spark desc order)
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else idOrd.compare(a._2, b._2)
      }
    }

  /** Aggregator keeping the k smallest under `ord` (= top-k by score
    * desc). The buffer is pruned whenever it exceeds 4k so reduce and
    * merge stay O(k log k) amortized and the shuffled buffer is ≤ k. */
  private class TopKAgg[I: Ordering](k: Int,
      bufEnc: Encoder[Seq[(Double, I)]],
      outEnc: Encoder[Seq[(Double, I)]])
    extends Aggregator[(Double, I), Seq[(Double, I)], Seq[(Double, I)]] {
    private val o = ord[I]
    private def prune(b: Seq[(Double, I)]): Seq[(Double, I)] =
      b.sorted(o).take(k)
    def zero: Seq[(Double, I)] = Vector.empty
    def reduce(b: Seq[(Double, I)], a: (Double, I)): Seq[(Double, I)] = {
      val nb = b :+ a
      if (nb.size > 4 * k) prune(nb) else nb
    }
    def merge(b1: Seq[(Double, I)], b2: Seq[(Double, I)]): Seq[(Double, I)] =
      prune(b1 ++ b2)
    def finish(b: Seq[(Double, I)]): Seq[(Double, I)] = prune(b)
    def bufferEncoder: Encoder[Seq[(Double, I)]] = bufEnc
    def outputEncoder: Encoder[Seq[(Double, I)]] = outEnc
  }

  /** top-k over (score: double, id: long) columns → sorted
    * array<struct<_1: double, _2: long>>. */
  def topKLong(k: Int, score: Column, id: Column): Column = {
    val enc = ExpressionEncoder[Seq[(Double, Long)]]()
    udaf(new TopKAgg[Long](k, enc, enc)).apply(score, id)
  }

  /** top-k over (score: double, id: string) columns. */
  def topKString(k: Int, score: Column, id: Column): Column = {
    val enc = ExpressionEncoder[Seq[(Double, String)]]()
    udaf(new TopKAgg[String](k, enc, enc)).apply(score, id)
  }
}
