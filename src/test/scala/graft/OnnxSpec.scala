package graft

import graft.operators.OnnxTransform
import org.scalatest.funsuite.AnyFunSuite

/** `onnx` transform plumbing with a deterministic stub session:
  * batching, tensor mapping resolution, schema evolution, and the
  * connector-slot default error. */
class OnnxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import OnnxSpec._

  private val config = """
    |sources:
    |  - name: in
    |    module: create
    |    parameters:
    |      type: int64
    |      from: 1
    |      to: 100
    |transforms:
    |  - name: inf
    |    module: onnx
    |    inputs: [in]
    |    parameters:
    |      bufferSize: 32
    |      model:
    |        path: /models/stub.onnx
    |        outputSchemaFields:
    |          - {name: score, type: float64}
    |      inferences:
    |        - mappings:
    |            - inputs: {x: value}
    |              outputs: {score: score}
    |""".stripMargin

  test("stub session: batched inference, mapped output column") {
    val prev = OnnxTransform.sessionFactory
    try {
      OnnxTransform.sessionFactory = stubFactory
      StubState.batches.clear()
      val dfs = Pipeline.build(spark, config)
      val rows = dfs("inf").collect()
      assert(rows.length == 100)
      rows.foreach { r =>
        val x = r.getAs[Long]("value")
        assert(r.getAs[Double]("score") == 2.0 * x)
      }
      // every batch bounded by bufferSize, none empty
      import scala.jdk.CollectionConverters._
      val sizes = StubState.batches.asScala.toSeq
      assert(sizes.nonEmpty && sizes.forall(s => s >= 1 && s <= 32))
      assert(sizes.sum == 100)
    } finally OnnxTransform.sessionFactory = prev
  }

  test("unmapped output fields default to same-name tensors; missing "
      + "tensors null-fill") {
    val prev = OnnxTransform.sessionFactory
    try {
      OnnxTransform.sessionFactory = stubFactory
      val cfg2 = config
        .replace("outputs: {score: score}", "outputs: {}")
        .replace("- {name: score, type: float64}",
          "- {name: score, type: float64}\n          - {name: missing, type: string}")
      val rows = Pipeline.build(spark, cfg2)("inf").collect()
      assert(rows.forall(r => r.getAs[Double]("score") > 0))
      assert(rows.forall(_.isNullAt(rows.head.fieldIndex("missing"))))
    } finally OnnxTransform.sessionFactory = prev
  }

  test("default factory raises the actionable jar error lazily, "
      + "at action not build") {
    val dfs = Pipeline.build(spark, config) // builds fine
    val e = intercept[Throwable] { dfs("inf").collect() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).flatMap(t => Option(t.getMessage)).mkString
        .contains("onnxruntime"))
  }

  test("config validation: model.path, outputSchemaFields, mappings, "
      + "unknown input field") {
    def bad(mut: String => String): Throwable =
      intercept[Throwable] { Pipeline.build(spark, mut(config)) }
    assert(bad(_.replace("path: /models/stub.onnx", "note: x"))
      .getMessage.contains("model.path"))
    assert(bad(_.replace("- {name: score, type: float64}", "[]"))
      .getMessage.contains("outputSchemaFields"))
    assert(bad(_.replace("inputs: {x: value}", "inputs: {x: nope}"))
      .getMessage.contains("nope"))
  }

  test("pubsub source and sink are validated connector slots") {
    val src = """
      |sources:
      |  - name: s
      |    module: pubsub
      |    parameters: {subscription: "projects/p/subscriptions/s"}
      |""".stripMargin
    val e1 = intercept[IllegalStateException] { Pipeline.build(spark, src) }
    assert(e1.getMessage.contains("connector slot"))
    val noSub = intercept[IllegalArgumentException] {
      Pipeline.build(spark, src.replace(
        """parameters: {subscription: "projects/p/subscriptions/s"}""",
        "parameters: {}"))
    }
    assert(noSub.getMessage.contains("subscription or topic"))
  }
}

/** Top-level (serializable closure members): Spark serializes tasks
  * even under local[*]. */
object OnnxSpec {
  /** Stub "model": score = 2*x + y per row; records batch sizes so
    * the bufferSize contract is assertable. */
  class StubSession extends OnnxTransform.Session with Serializable {
    def run(inputs: Map[String, IndexedSeq[Any]], n: Int)
        : Map[String, IndexedSeq[Any]] = {
      StubState.batches.add(n)
      val xs = inputs("x")
      val ys = inputs.getOrElse("y", IndexedSeq.fill(n)(0L: Any))
      Map("score" -> (0 until n).map { i =>
        (2.0 * num(xs(i)) + num(ys(i))): Any
      })
    }
    private def num(a: Any): Double = a match {
      case null => 0.0
      case n: Number => n.doubleValue()
      case s => s.toString.toDouble
    }
  }
  object StubState {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  }
  val stubFactory: String => OnnxTransform.Session =
    _ => new StubSession
}
