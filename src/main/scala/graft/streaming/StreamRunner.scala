package graft.streaming

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Starts streaming sinks (SURVEY §2.9): `writeStream` with the
  * module's trigger; output mode approximates Beam accumulation
  * (`discarding` → append, `accumulating` → update/complete). Started
  * queries are registered here so callers (tests, drivers) can drain
  * with `processAllAvailable` or block on `awaitAny`. */
object StreamRunner {

  private val active = scala.collection.mutable.ListBuffer[StreamingQuery]()

  def activeQueries: Seq[StreamingQuery] = active.toSeq.filter(_.isActive)

  /** Every query started this session, dead or alive — consult this
    * (not activeQueries) when surfacing failures: a query that died in
    * its first micro-batch is already inactive. */
  def allQueries: Seq[StreamingQuery] = active.toSeq

  def start(cfg: ModuleCfg, df: DataFrame): StreamingQuery = {
    val p = cfg.params
    // default mode: file sinks only support append (the watermark
    // plumbing exists to finalize windows for exactly this case);
    // memory/debug sinks show the running aggregate via complete
    val fileSink = cfg.module == "storage" || cfg.module == "files"
    var w = df.writeStream
      .outputMode(p.str("outputMode").getOrElse(
        if (hasAggregation(df) && !fileSink) "complete" else "append"))
    p.str("checkpointLocation").foreach(c =>
      w = w.option("checkpointLocation", c))
    // trigger from the module's strategy (Strategy.java:232-343):
    // afterProcessingTime(delay) → ProcessingTime; batch catch-up →
    // AvailableNow; default = micro-batch ASAP
    cfg.node("strategy").flatMap(_.apply("trigger")) match {
      case Some(t) if t.str("type").contains("afterProcessingTime") =>
        w = w.trigger(Trigger.ProcessingTime(
          t.int("delay").getOrElse(1) * 1000L))
      case Some(t) if t.str("type").contains("availableNow") =>
        w = w.trigger(Trigger.AvailableNow())
      case _ =>
    }
    val q = cfg.module match {
      case "debug" | "memory" =>
        w.format("memory").queryName(cfg.name).start()
      case "storage" | "files" =>
        val path = p.str("output").orElse(p.str("path")).get
        w.format(p.str("format").getOrElse("parquet"))
          .option("path", path)
          .option("checkpointLocation",
            p.str("checkpointLocation").getOrElse(path + "/_checkpoint"))
          .start()
      case other =>
        throw new IllegalArgumentException(s"streaming sink: $other")
    }
    active += q
    q
  }

  private def hasAggregation(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isDefined

  /** Drain every active query (test/batch-catchup helper). A query
    * that already died is surfaced here instead of silently filtered
    * out by the isActive check. */
  def drainAll(): Unit = {
    active.toSeq.foreach { q =>
      q.exception.foreach(e => throw e)
      if (q.isActive) q.processAllAvailable()
    }
  }

  def stopAll(): Unit = {
    activeQueries.foreach(_.stop())
    active.clear()
  }
}
