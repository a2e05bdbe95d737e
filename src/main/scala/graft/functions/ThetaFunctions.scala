package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, UpdateSketch}
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable distinct-SET sketches (DataSketches Theta) — the fourth
  * mergeable-sketch family next to HLL (distinct counts),
  * frequent-items (top-k) and KLL (quantiles). HLL only counts;
  * theta sketches keep a hash SAMPLE of the set, so two sketches
  * support set ALGEBRA: intersection and difference estimates —
  * "how many distinct URLs do these two crawls share", "how many
  * fingerprints are new in today's snapshot" — computed sketch-vs-
  * sketch, without ever shuffling the raw sets against each other.
  * At 100 TB that turns cross-corpus overlap audits into the same
  * two-stage pattern as the other sketch families: one sketch per
  * corpus/partition/day (map-side partial combine), set ops on the
  * compact sketches afterwards.
  *
  * `thetaSketch` accumulates values (as strings) into a compact
  * binary sketch; `thetaUnion` merges sketch columns from earlier
  * aggregations. A sketch with nominal entries 2^lgK is EXACT while
  * the distinct count stays below its sampling threshold (≥ 2^lgK),
  * so bounded-domain oracles pin exact values — beyond that the
  * published relative standard error is ~1/sqrt(2^lgK).
  *
  * The aggregation buffer batches raw values and folds them into the
  * serialized sketch every [[ThetaFunctions.batchSize]] rows, like
  * the KLL agg — per-row cost is an append, and the sketch
  * round-trips O(n / batch) times per partition. */
object ThetaFunctions {

  private val batchSize = 1024

  private def fold(bytes: Array[Byte], vals: Seq[String],
      lgK: Int): Array[Byte] = {
    if (vals.isEmpty && bytes != null) return bytes
    val upd = UpdateSketch.builder.setLogNominalEntries(lgK).build()
    vals.foreach(v => if (v != null) upd.update(v))
    if (bytes == null) upd.compact.toByteArray
    else {
      val u = SetOperation.builder.setLogNominalEntries(lgK)
        .buildUnion()
      u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
      u.union(upd.compact)
      u.getResult.toByteArray
    }
  }

  private def mergeBytes(a: Array[Byte], b: Array[Byte],
      lgK: Int): Array[Byte] = {
    if (a == null) return b
    if (b == null) return a
    val u = SetOperation.builder.setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(a)))
    u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
    u.getResult.toByteArray
  }

  private class ThetaAgg(lgK: Int,
      bufEnc: Encoder[(Array[Byte], Seq[String])],
      outEnc: Encoder[Array[Byte]])
    extends Aggregator[String, (Array[Byte], Seq[String]), Array[Byte]] {
    def zero: (Array[Byte], Seq[String]) = (null, Vector.empty)
    def reduce(b: (Array[Byte], Seq[String]), a: String)
        : (Array[Byte], Seq[String]) =
      if (a == null) b
      else {
        val pend = b._2 :+ a
        if (pend.size >= batchSize) (fold(b._1, pend, lgK), Vector.empty)
        else (b._1, pend)
      }
    def merge(b1: (Array[Byte], Seq[String]),
        b2: (Array[Byte], Seq[String])): (Array[Byte], Seq[String]) =
      (mergeBytes(fold(b1._1, b1._2, lgK), fold(b2._1, b2._2, lgK),
        lgK), Vector.empty)
    // internal buffers stay raw; only the EMITTED payload carries
    // the version envelope
    def finish(b: (Array[Byte], Seq[String])): Array[Byte] =
      SketchPayload.wrap(fold(b._1, b._2, lgK))
    def bufferEncoder: Encoder[(Array[Byte], Seq[String])] = bufEnc
    def outputEncoder: Encoder[Array[Byte]] = outEnc
  }

  private class ThetaMergeAgg(lgK: Int,
      bufEnc: Encoder[Array[Byte]], outEnc: Encoder[Array[Byte]])
    extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = null
    def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
      mergeBytes(b, SketchPayload.unwrap(a, "theta_union"), lgK)
    def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      mergeBytes(b1, b2, lgK)
    def finish(b: Array[Byte]): Array[Byte] =
      SketchPayload.wrap(
        if (b == null)
          UpdateSketch.builder.setLogNominalEntries(lgK).build()
            .compact.toByteArray
        else b)
    def bufferEncoder: Encoder[Array[Byte]] = bufEnc
    def outputEncoder: Encoder[Array[Byte]] = outEnc
  }

  def thetaSketch(lgK: Int, value: Column): Column =
    udaf(new ThetaAgg(lgK,
      ExpressionEncoder[(Array[Byte], Seq[String])](),
      ExpressionEncoder[Array[Byte]]()),
      ExpressionEncoder[String]())(value)

  def thetaUnion(lgK: Int, sketch: Column): Column =
    udaf(new ThetaMergeAgg(lgK,
      ExpressionEncoder[Array[Byte]](), ExpressionEncoder[Array[Byte]]()),
      ExpressionEncoder[Array[Byte]]())(sketch)

  private def sk(bytes: Array[Byte], where: String): CompactSketch =
    Sketches.wrapCompactSketch(
      Memory.wrap(SketchPayload.unwrap(bytes, where)))

  /** Distinct-count estimate of a binary theta sketch column. */
  def thetaEstimate(sketch: Column): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (bytes: Array[Byte]) =>
        if (bytes == null) null
        else java.lang.Double.valueOf(
          sk(bytes, "theta_estimate").getEstimate))
    f(sketch)
  }

  /** Estimate of |A ∩ B| from two binary theta sketch columns. */
  def thetaIntersect(a: Column, b: Column): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (x: Array[Byte], y: Array[Byte]) =>
        if (x == null || y == null) null
        else {
          val i = SetOperation.builder.buildIntersection()
          i.intersect(sk(x, "theta_intersect"))
          i.intersect(sk(y, "theta_intersect"))
          java.lang.Double.valueOf(i.getResult.getEstimate)
        })
    f(a, b)
  }

  /** Estimate of |A \ B| from two binary theta sketch columns. */
  def thetaDifference(a: Column, b: Column): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (x: Array[Byte], y: Array[Byte]) =>
        if (x == null || y == null) null
        else {
          val d = SetOperation.builder.buildANotB()
          java.lang.Double.valueOf(
            d.aNotB(sk(x, "theta_difference"),
              sk(y, "theta_difference")).getEstimate)
        })
    f(a, b)
  }
}
