package graft.operators

import com.fasterxml.jackson.databind.JsonNode
import graft.Pipeline.ModuleCfg
import graft.config.Json._
import graft.schema.SchemaMapper
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** `onnx` transform — batched model inference over rows (reference
  * `transform/ONNXTransform.java`, 590 LoC on onnxruntime).
  *
  * Config mirrors the reference:
  * {{{
  * parameters:
  *   model:
  *     path: /models/clf.onnx
  *     outputSchemaFields: [{name: score, type: float64}]
  *   inferences:
  *     - mappings:
  *         - inputs:  {x: feature_col}     # tensor name -> row field
  *           outputs: {score: score}       # row field -> tensor name
  *   bufferSize: 32
  * }}}
  *
  * Spark shape: `mapPartitions` with one session per partition and
  * rows buffered into `bufferSize` batches per `session.run` — tensor
  * batching is the entire perf point of ONNX on a cluster, and the
  * per-partition lifecycle is what a per-row UDF can't express. At
  * 100 TB this is embarrassingly parallel: no shuffle, model loaded
  * once per task, batch size bounds peak tensor memory.
  *
  * The runtime itself is NOT bundled (no onnxruntime jar in this
  * environment), so the session is pluggable via `sessionFactory`:
  * the default factory raises an actionable jar error at first use
  * (same contract as the kafka/iceberg connector slots), and tests
  * install a deterministic stub to exercise the real plumbing —
  * batching, mapping resolution, schema evolution, failure routing.
  */
object OnnxTransform {

  /** One inference batch: `inputs(tensorName)(i)` is row i's value.
    * Returns `outputs(tensorName)(i)`. Implementations convert to/from
    * the runtime's tensor types. */
  trait Session extends java.io.Closeable {
    def run(inputs: Map[String, IndexedSeq[Any]], n: Int)
        : Map[String, IndexedSeq[Any]]
    def close(): Unit = ()
  }

  /** modelPath => Session, created once per partition on executors.
    * Must be a static/serializable-safe reference — reassign the
    * whole var (tests) rather than capturing per-query state. */
  @volatile var sessionFactory: String => Session = defaultFactory

  /** Honestly-stubbed CI/test session (same stance as
    * `MultimodalTransform.StubCodecs`): a `stub:linear` model path
    * runs a deterministic linear "model" — every output tensor t is
    * `2*x + 1` over the first input tensor, elementwise per row
    * (scalar rows stay scalar; vector rows — e.g. the multimodal
    * embed pixel tensor — map per element to a vector) — so the
    * full mapPartitions batching pipeline exercises under the
    * driver's DuckDB oracle without the onnxruntime jar. Real model
    * paths raise the connector-slot error until a runtime-backed
    * factory is installed. */
  class LinearStubSession extends Session with java.io.Serializable {
    private def lin(x: Double): Double = 2.0 * x + 1.0
    def run(inputs: Map[String, IndexedSeq[Any]], n: Int)
        : Map[String, IndexedSeq[Any]] = {
      val first = inputs.valuesIterator.next()
      Map("out" -> (0 until n).map { i =>
        (first(i) match {
          case null => lin(0.0)
          case a: Array[Double] => a.map(lin)
          case a: Array[Float] => a.map(v => lin(v.toDouble))
          case s: Seq[_] => s.map {
            case m: Number => lin(m.doubleValue())
            case x => lin(x.toString.toDouble)
          }
          case v: Number => lin(v.doubleValue())
          case v => lin(v.toString.toDouble)
        }): Any
      })
    }
  }

  private def defaultFactory: String => Session = {
    case stub if stub.startsWith("stub:") => new LinearStubSession
    case path =>
      throw new IllegalStateException(
        "onnx transform requires the onnxruntime jar on the classpath " +
          "(com.microsoft.onnxruntime:onnxruntime:<version>); install a " +
          s"Session factory for model '$path' via OnnxTransform" +
          ".sessionFactory to plug a runtime in")
  }

  private case class Mapping(inputs: Map[String, String],
      outputs: Map[String, String])

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    val p = cfg.params
    val model = p("model").getOrElse(throw new IllegalArgumentException(
      "onnx transform requires parameters.model"))
    val modelPath = model.str("path").getOrElse(
      throw new IllegalArgumentException(
        "onnx transform requires model.path"))
    val outFields = model.arrOf("outputSchemaFields")
      .map(SchemaMapper.toStructField)
    if (outFields.isEmpty)
      throw new IllegalArgumentException(
        "onnx transform requires model.outputSchemaFields")
    val bufferSize = p.int("bufferSize").getOrElse(32)
    require(bufferSize >= 1, "bufferSize must be over than zero")

    val mappings: Seq[Mapping] = p.arrOf("inferences").flatMap(inf =>
      inf.arrOf("mappings").map { m =>
        Mapping(strMap(m("inputs")), strMap(m("outputs")))
      })
    if (mappings.isEmpty)
      throw new IllegalArgumentException(
        "onnx transform requires inferences[].mappings")

    // per-row CPU; spread under-partitioned input like multimodal
    val df = TransformCommon.widen(TransformCommon.single(cfg, inputs))
    val schema = df.schema
    mappings.foreach(_.inputs.values.foreach { f =>
      if (!schema.fieldNames.contains(f))
        throw new IllegalArgumentException(
          s"onnx mapping input field not found: $f")
    })
    val outSchema = outFields.foldLeft(schema)(_ add _)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    val inIdx: Seq[Map[String, Int]] = // tensor name -> row ordinal
      mappings.map(_.inputs.map { case (t, f) => t -> schema.fieldIndex(f) })
    val outNames = outFields.map(_.name)
    // row field -> output tensor; unmapped output fields default to a
    // tensor of the same name (reference MappingParameter defaulting)
    val outTensor: Seq[Map[String, String]] = mappings.map(m =>
      outNames.map(n => n -> m.outputs.getOrElse(n, n)).toMap)
    val factory = sessionFactory

    val result = df.mapPartitions { it =>
      var session: Session = null // one per partition, lazily opened
      def sess(): Session = {
        if (session == null) {
          session = factory(modelPath)
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null)
            tc.addTaskCompletionListener[Unit](_ => session.close())
        }
        session
      }
      it.grouped(bufferSize).flatMap { batch =>
        // run every mapping over the batch; later mappings win on
        // field conflicts (reference runs them as a sequence)
        val outByField = scala.collection.mutable.Map[String, IndexedSeq[Any]]()
        inIdx.zip(outTensor).foreach { case (idx, tmap) =>
          val tensors = idx.map { case (t, i) =>
            t -> batch.map(_.get(i)).toIndexedSeq
          }
          val out = sess().run(tensors, batch.size)
          tmap.foreach { case (field, tensor) =>
            out.get(tensor).foreach(v => outByField(field) = v)
          }
        }
        batch.iterator.zipWithIndex.map { case (row, i) =>
          Row.fromSeq(row.toSeq ++ outNames.map(n =>
            outByField.get(n).map(_(i)).orNull))
        }
      }
    }(enc)
    TransformCommon.finishRouted(result, cfg)
  }

  private def strMap(node: Option[JsonNode]): Map[String, String] =
    node.map(n => n.names.map(k => k -> n.get(k).asText).toMap)
      .getOrElse(Map.empty)
}
