package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-module logging taps (reference `module/Logging.java` — named
  * log points on any module, logged per element as data flows).
  *
  * Per-row driver logging is a non-starter at scale, so the Spark
  * mapping is `Dataset.observe`: named metrics (row count, an
  * example-value sample) collected DURING execution with zero plan
  * interference — no extra action, no UDF in the predicate path, no
  * pushdown loss — surfaced through a QueryExecutionListener at the
  * configured level. The observed metrics of the last completed
  * action are also kept in `observed` for tests and the Run CLI.
  */
object LoggingTaps {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** metric name → observed values of the most recent action. */
  val observed = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Any]]()

  // weak keys: a strong set would pin every stopped SparkSession (and
  // its whole object graph) for the JVM lifetime in session-per-run
  // harnesses
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  // last-emitted value signature per metric — the single atomic gate
  // both delivery legs go through. foreachBatch-drained streaming
  // sinks fire BOTH the batch QueryExecutionListener (their inner
  // action) and the streaming progress, on independent async buses in
  // either order; the atomic put-and-compare in emitOnce makes
  // whichever arrives first emit and the other skip, so each batch
  // logs once regardless of ordering. Signatures render arrays by value (Array.equals is
  // reference equality). Cost: a repeat action with byte-identical
  // values skips its log line; `observed` is updated either way.
  private val lastEmitted =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def signature(m: Map[String, Any]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) =>
      val s = v match {
        case a: Array[_] => a.mkString("[", ",", "]")
        case x => String.valueOf(x)
      }
      s"$k=$s"
    }.mkString(";")

  private def emitOnce(name: String,
      row: org.apache.spark.sql.Row): Unit = {
    val m = row.getValuesMap[Any](row.schema.fieldNames)
    observed.put(name, m)
    val sig = signature(m)
    if (lastEmitted.put(name, sig) != sig) {
      val (tag, level) = name.split('|') match {
        case Array(n, l) => (n, l)
        case _ => (name, "info")
      }
      val msg = s"[logging:$tag] $m"
      level match {
        case "trace" => log.trace(msg)
        case "debug" => log.debug(msg)
        case "warn" => log.warn(msg)
        case "error" => log.error(msg)
        case _ => log.info(msg)
      }
    }
  }

  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            emitOnce(name, row)
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
      // streaming taps surface per micro-batch through the streaming
      // progress (observe works on streaming frames; only the
      // delivery channel differs); emitOnce dedupes against the
      // batch-listener leg above in either delivery order
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: QueryProgressEvent): Unit =
            e.progress.observedMetrics.forEach { (name, row) =>
              emitOnce(name, row)
            }
          override def onQueryTerminated(
              e: QueryTerminatedEvent): Unit = ()
        })
    }

  /** Attach an observation tap to a module output. Metric name
    * encodes the level so the listener (which only sees the name)
    * can honor it. Streaming frames support observe too; their
    * metrics surface via streaming progress instead of this
    * listener. */
  def tap(df: DataFrame, module: String, name: String,
      level: String): DataFrame =
    df.observe(s"$module.$name|$level", count(lit(1)).as("count"))
}
