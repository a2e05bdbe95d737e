package graft.streaming

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** `stateful` transform — the reference's stateful select functions
  * (`util/pipeline/select/stateful/Lag.java`, executed by keyed
  * stateful DoFns with OrderedListState buffers,
  * `SelectTransform.java:391-549`) on both batch and streams.
  *
  * fields: [{name, field, offset}] — each output is `field` lagged by
  * `offset` rows within the `groupFields` key, ordered by event time.
  *
  * Batch: `Window.partitionBy(keys).orderBy(ts)` + `lag()` — the
  * scalable declarative form (@RequiresTimeSortedInput equivalent).
  * Streaming: `flatMapGroupsWithState` with a bounded per-key buffer
  * of the last max(offset) values. Rows inside one micro-batch are
  * sorted by event time before applying state (the documented
  * approximation of Beam's event-time timers — SURVEY §7.4.2; true
  * cross-batch ordering is watermark-best-effort).
  */
object StatefulTransform {

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val df = TransformsRef.single(cfg, inputs)
    val keys = cfg.params.strArr("groupFields")
    val orderField = cfg.params.str("orderField").getOrElse("__event_time")
    val fields = cfg.params.arrOf("fields").map { f =>
      (f.str("name").getOrElse(s"${f.str("field").get}_lag"),
        f.str("field").get,
        f.int("offset").getOrElse(1))
    }
    require(fields.nonEmpty,
      s"stateful ${cfg.name}: fields must be non-empty")
    fields.foreach { case (name, _, k) =>
      // validated on BOTH legs: the streaming buffer indexes k-1, so
      // an unchecked 0 would pass in batch (lag(_, 0) = current row)
      // and crash executors in streaming
      require(k >= 1,
        s"stateful ${cfg.name}: offset for '$name' must be >= 1, got $k")
    }
    val out =
      if (!df.isStreaming) {
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(orderField))
        fields.foldLeft(df) { case (d, (name, field, k)) =>
          d.withColumn(name, lag(col(field), k).over(w))
        }
      } else streamingLag(df, keys, orderField, fields)
    Map(cfg.name -> out)
  }

  private def streamingLag(df: DataFrame, keys: Seq[String],
      orderField: String,
      fields: Seq[(String, String, Int)]): DataFrame = {
    val inSchema = df.schema
    val outSchema = fields.foldLeft(inSchema) { case (s, (name, field, _)) =>
      s.add(name, inSchema(field).dataType)
    }
    val keyIdx = keys.map(inSchema.fieldIndex)
    val ordIdx = inSchema.fieldIndex(orderField)
    val fieldIdx = fields.map { case (_, f, k) => (inSchema.fieldIndex(f), k) }
    val bufSize = fields.map(_._3).max

    implicit val outEnc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    implicit val stateEnc = Encoders.kryo[List[List[Any]]]

    // length-prefixed key encoding: a plain mkString collides for
    // null vs the string "null" and for values containing the
    // separator, silently merging two keys' lag buffers (the batch
    // leg partitions on the real columns and would disagree)
    val grouped = df.groupByKey(row =>
      keyIdx.map { i =>
        val v = row.get(i)
        if (v == null) "\u0000"
        else { val x = String.valueOf(v); x.length.toString + ":" + x }
      }.mkString("\u0001"))(Encoders.STRING)

    grouped.flatMapGroupsWithState[List[List[Any]], Row](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_, rows, state: GroupState[List[List[Any]]]) =>
        // buffer: most-recent-first lists of the lagged fields' values
        var buf: List[List[Any]] = state.getOption.getOrElse(Nil)
        // true value ordering, matching the batch leg's orderBy —
        // hashCode is not monotonic and would lag against effectively
        // random predecessors for string/date order fields
        val sorted = rows.toSeq.sortWith { (a, b) =>
          compareOrd(a.get(ordIdx), b.get(ordIdx)) < 0
        }
        val outRows = sorted.map { r =>
          // buffer entries are stored in fieldIdx order, so field
          // j's lagged value sits at position j — no per-row scan
          val lagged = fieldIdx.zipWithIndex.map { case ((_, k), j) =>
            if (buf.size >= k) buf(k - 1)(j) else null
          }
          buf = fieldIdx.map { case (fi, _) => r.get(fi) }.toList :: buf
          if (buf.size > bufSize) buf = buf.take(bufSize)
          Row.fromSeq(r.toSeq ++ lagged)
        }
        state.update(buf)
        outRows.iterator
    }.toDF()
  }

  /** Order-field comparison with SQL null-first semantics (matching
    * `Window.orderBy`'s default asc_nulls_first). Spark columns are
    * uniformly typed and every orderable Spark type surfaces as a
    * `Comparable` (Timestamp, Date, String, boxed numerics,
    * BigDecimal), so anything else is a config error worth failing
    * loudly on. */
  private def compareOrd(x: Any, y: Any): Int = (x, y) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (a: Comparable[_], b) if a.getClass.isInstance(b) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    case (a, _) => throw new IllegalArgumentException(
      s"stateful: order field type ${a.getClass.getName} is not orderable")
  }
}

/** tiny indirection to avoid a cyclic import with operators. */
private[streaming] object TransformsRef {
  def single(cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): DataFrame = {
    require(inputs.nonEmpty, s"module ${cfg.name} requires an input")
    inputs(cfg.inputs.head)
  }
}
