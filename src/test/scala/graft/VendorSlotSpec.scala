package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** §7.5 vendor connector slots: every reference module name parses,
  * validates its real parameter contract, and fails with guidance —
  * never "unknown module". `copyfile` executes locally. */
class VendorSlotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def srcCfg(module: String, params: String) = s"""
    |sources:
    |  - name: s
    |    module: $module
    |    parameters: {$params}
    |""".stripMargin

  private def sinkCfg(module: String, params: String) = s"""
    |sources:
    |  - name: in
    |    module: create
    |    parameters:
    |      elements: [{id: 1}]
    |      schema: {fields: [{name: id, type: int64}]}
    |sinks:
    |  - name: k
    |    module: $module
    |    inputs: [in]
    |    parameters: {$params}
    |""".stripMargin

  test("vendor source slots validate their contracts then fail "
      + "actionably") {
    val cases = Seq(
      ("bigquery", "table: p.d.t", "query or table"),
      ("spanner",
        "projectId: p, instanceId: i, databaseId: d, table: t",
        "projectId"),
      ("bigtable", "projectId: p, instanceId: i, tableId: t",
        "projectId"),
      ("datastore", "gql: \"SELECT * FROM k\"", "gql"),
      ("firestore", "collection: c", "collection"),
      ("drivefile", "query: \"name contains 'x'\"", "query"))
    cases.foreach { case (module, params, missingKey) =>
      // full params → connector-slot error (not unknown module)
      val e = intercept[IllegalStateException] {
        Pipeline.build(spark, srcCfg(module, params))
      }
      assert(e.getMessage.contains("connector slot"), module)
      // empty params → the module's own required-parameter error
      val v = intercept[IllegalArgumentException] {
        Pipeline.build(spark, srcCfg(module, "note: x"))
      }
      assert(v.getMessage.contains(missingKey), module)
    }
  }

  test("vendor sink and transform slots registered") {
    Seq("bigquery" -> "table: p.d.t",
      "spanner" -> "projectId: p, instanceId: i, databaseId: d",
      "localH2" -> "output: /tmp/x.mv.db",
      "localSolr" -> "output: /tmp/s, cores: [c]",
      "tasks" -> "queue: q",
      "matchingEngine" ->
        "projectId: p, indexId: i, idField: id, vectorField: v",
      "action" -> "service: bigquery").foreach { case (m, params) =>
      val e = intercept[IllegalStateException] {
        Pipeline.build(spark, sinkCfg(m, params))
      }
      assert(e.getMessage.contains("connector slot"), m)
    }
    // automl/changeStream transforms: contract validated, then the
    // slot error points at the local equivalent
    Seq("automl" -> ("endpoint: e", "onnx"),
      "changeStream" -> ("type: spanner", "microbatch"))
      .foreach { case (m, (params, hint)) =>
        val e = intercept[IllegalStateException] {
          Pipeline.build(spark, s"""
            |sources:
            |  - name: in
            |    module: create
            |    parameters:
            |      elements: [{id: 1}]
            |      schema: {fields: [{name: id, type: int64}]}
            |transforms:
            |  - name: x
            |    module: $m
            |    inputs: [in]
            |    parameters: {$params}
            |""".stripMargin)
        }
        assert(e.getMessage.contains(hint), m)
        val v = intercept[IllegalArgumentException] {
          Pipeline.build(spark, s"""
            |sources:
            |  - name: in
            |    module: create
            |    parameters:
            |      elements: [{id: 1}]
            |      schema: {fields: [{name: id, type: int64}]}
            |transforms:
            |  - name: x
            |    module: $m
            |    inputs: [in]
            |    parameters: {note: x}
            |""".stripMargin)
        }
        assert(v != null, m)
      }
    val t = intercept[IllegalStateException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: in
        |    module: create
        |    parameters:
        |      elements: [{id: 1}]
        |      schema: {fields: [{name: id, type: int64}]}
        |transforms:
        |  - name: x
        |    module: pdfextract
        |    inputs: [in]
        |    parameters: {field: id}
        |""".stripMargin)
    }
    assert(t.getMessage.contains("multimodal"))
  }

  test("copyfile executes local copies: static source and "
      + "sourceField column") {
    val dir = Files.createTempDirectory("graft-copyfile")
    val a = dir.resolve("a.txt"); val b = dir.resolve("b.txt")
    Files.write(a, "alpha".getBytes(StandardCharsets.UTF_8))
    Files.write(b, "beta".getBytes(StandardCharsets.UTF_8))
    val out = dir.resolve("out")

    // static single-file copy
    Pipeline.execute(spark, s"""
      |sinks:
      |  - name: cp
      |    module: copyfile
      |    parameters: {source: "${a.toString}", destination: "${out.resolve("a2.txt")}"}
      |""".stripMargin)
    assert(Files.readString(out.resolve("a2.txt")) == "alpha")

    // per-record paths from a column
    Pipeline.execute(spark, s"""
      |sources:
      |  - name: in
      |    module: create
      |    parameters:
      |      elements:
      |        - {p: "${a.toString}"}
      |        - {p: "${b.toString}"}
      |      schema: {fields: [{name: p, type: string}]}
      |sinks:
      |  - name: cp
      |    module: copyfile
      |    inputs: [in]
      |    parameters: {sourceField: p, destination: "${out.resolve("many")}"}
      |""".stripMargin)
    assert(Files.readString(out.resolve("many").resolve("a.txt")) == "alpha")
    assert(Files.readString(out.resolve("many").resolve("b.txt")) == "beta")

    // vendor service → slot error
    val e = intercept[IllegalStateException] {
      Pipeline.build(spark, s"""
        |sinks:
        |  - name: cp
        |    module: copyfile
        |    parameters: {sourceService: gcs, source: "gs://b/x", destination: "/tmp/x"}
        |""".stripMargin)
    }
    assert(e.getMessage.contains("connector slot"))
  }
}
