package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** Config resolution surface: context overlays, imports, declared
  * args, failure policy, alterConfig fallback (reference
  * `config/Config.java`, `MPipeline.java:93-106`). */
class ConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def elems = """
    "sources": [{
      "name": "in", "module": "create",
      "parameters": {
        "elements": [{"id": 1}, {"id": 2}, {"id": 3}],
        "schema": {"fields": [{"name": "id", "type": "int64"}]}
      }
    }]"""

  test("context selects tagged modules; untagged are ignored") {
    // under a context, untagged modules — including sources — are
    // ignored (ModuleConfig.applyContext), so the shared source must
    // carry every context it serves
    val config = s"""
      |{
      |  "system": {"context": "prod"},
      |  "sources": [{
      |    "name": "in", "module": "create", "tags": ["dev", "prod"],
      |    "parameters": {
      |      "elements": [{"id": 1}, {"id": 2}, {"id": 3}],
      |      "schema": {"fields": [{"name": "id", "type": "int64"}]}
      |    }
      |  }],
      |  "transforms": [
      |    {"name": "dev_only", "module": "filter", "inputs": ["in"],
      |     "tags": ["dev"],
      |     "parameters": {"filter": [{"key": "id", "op": "<", "value": 2}]}},
      |    {"name": "prod_only", "module": "filter", "inputs": ["in"],
      |     "tags": ["prod", "staging"],
      |     "parameters": {"filter": [{"key": "id", "op": ">", "value": 1}]}},
      |    {"name": "untagged", "module": "filter", "inputs": ["in"],
      |     "parameters": {"filter": [{"key": "id", "op": "=", "value": 1}]}}
      |  ]
      |}""".stripMargin
    // source has no tags either — context must only come into play
    // when set, so check both paths
    val prod = Pipeline.build(spark, config)
    assert(prod.contains("prod_only"))
    assert(!prod.contains("dev_only"))
    assert(!prod.contains("untagged"))
    assert(prod("prod_only").count() == 2)

    // caller-passed context overrides system.context
    val dev = Pipeline.build(spark, config, context = Some("dev"))
    assert(dev.contains("dev_only"))
    assert(!dev.contains("prod_only"))
    assert(dev("dev_only").count() == 1)
  }

  test("context on the source itself: tagged source runs, and no "
      + "context means tags are inert") {
    val config = s"""
      |{
      |  "sources": [{
      |    "name": "in", "module": "create", "tags": ["a"],
      |    "parameters": {
      |      "elements": [{"id": 1}],
      |      "schema": {"fields": [{"name": "id", "type": "int64"}]}
      |    }
      |  }]
      |}""".stripMargin
    val noCtx = Pipeline.build(spark, config)
    assert(noCtx.contains("in"))
    val a = Pipeline.build(spark, config, context = Some("a"))
    assert(a.contains("in"))
    val b = Pipeline.build(spark, config, context = Some("b"))
    assert(!b.contains("in"))
  }

  test("matching tag overrides an explicit ignore (reference "
      + "applyContext overwrites unconditionally)") {
    val config = s"""
      |{
      |  "sources": [{
      |    "name": "in", "module": "create", "tags": ["x"],
      |    "parameters": {
      |      "elements": [{"id": 1}, {"id": 2}, {"id": 3}],
      |      "schema": {"fields": [{"name": "id", "type": "int64"}]}
      |    }
      |  }],
      |  "transforms": [
      |    {"name": "t", "module": "filter", "inputs": ["in"],
      |     "tags": ["x"], "ignore": true,
      |     "parameters": {"filter": [{"key": "id", "op": ">", "value": 0}]}}
      |  ]
      |}""".stripMargin
    assert(!Pipeline.build(spark, config).contains("t"))
    assert(Pipeline.build(spark, config, context = Some("x")).contains("t"))
  }

  test("declared args substitute, may reference other args, and win "
      + "over caller args (reference processArgs order)") {
    // YAML block style: unsubstituted ${args.x} in value position is
    // a plain scalar, same tolerance as the reference's lenient gson
    val config = """
      |args: {lo: "1", hi: "${args.lo}0", who: config}
      |sources:
      |  - name: in
      |    module: create
      |    parameters:
      |      elements:
      |        - id: ${args.lo}
      |        - id: ${args.hi}
      |        - id: 5
      |      schema: {fields: [{name: id, type: int64}]}
      |transforms:
      |  - name: f
      |    module: filter
      |    inputs: [in]
      |    parameters:
      |      filter:
      |        - key: id
      |          op: "<"
      |          value: ${args.hi}
      |""".stripMargin
    val dfs = Pipeline.build(spark, config, Map("who" -> "cli"))
    // lo=1, hi=10 → elements 1,10,5; filter id<10 keeps 1,5
    assert(dfs("f").count() == 2)
    val r = ConfigLoaderAccess.resolve(config, Map("who" -> "cli"))
    assert(r.args("who") == "config")
    assert(r.args("hi") == "10")
  }

  test("imports append sub-config modules with import args; parent "
      + "args win on conflict") {
    val dir = Files.createTempDirectory("graft-imports")
    val sub = dir.resolve("sub.yaml")
    Files.write(sub,
      """transforms:
        |  - name: imported
        |    module: filter
        |    inputs: [in]
        |    parameters:
        |      filter:
        |        - key: id
        |          op: "<"
        |          value: ${args.cut}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val config = s"""
      |{
      |  "system": {"imports": [
      |    {"base": "${dir.toString}/", "files": ["sub.yaml"],
      |     "args": {"cut": "2"}}
      |  ]},
      |  $elems
      |}""".stripMargin
    val dfs = Pipeline.build(spark, config)
    assert(dfs.contains("imported"))
    assert(dfs("imported").count() == 1) // id < 2

    // parent-level arg overrides the import's own default
    val dfs2 = Pipeline.build(spark, config, Map("cut" -> "3"))
    assert(dfs2("imported").count() == 2) // id < 3
  }

  test("import cycles are detected, not stack-overflowed") {
    val dir = Files.createTempDirectory("graft-import-cycle")
    val a = dir.resolve("a.json")
    Files.write(a,
      s"""{"system": {"imports": [{"files": ["${a.toString}"]}]},
         | $elems}""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val config = s"""
      |{"system": {"imports": [{"files": ["${a.toString}"]}]},
      | $elems}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      Pipeline.build(spark, config)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("system.failure.failFast stamps every module") {
    val config = s"""
      |{
      |  "system": {"failure": {"failFast": true}},
      |  "sources": [{
      |    "name": "in", "module": "create",
      |    "parameters": {
      |      "elements": [{"s": "notanumber"}],
      |      "schema": {"fields": [{"name": "s", "type": "string"}]}
      |    }
      |  }],
      |  "transforms": [
      |    {"name": "sel", "module": "select", "inputs": ["in"],
      |     "parameters": {"select": [
      |       {"name": "n", "field": "s", "type": "int64"}]}}
      |  ]
      |}""".stripMargin
    val dfs = Pipeline.build(spark, config)
    val e = intercept[Throwable] { dfs("sel").collect() }
    assert(e.getMessage != null)
    // without the global flag the same cast nulls out leniently
    val lenient = Pipeline.build(spark,
      config.replace("""{"failure": {"failFast": true}}""", "{}"))
    assert(lenient("sel").collect().head.isNullAt(0))
  }

  test("execute falls back to alterConfig when the pipeline fails "
      + "to build") {
    val dir = Files.createTempDirectory("graft-alter")
    val out = dir.resolve("out")
    val alter = dir.resolve("alter.json")
    Files.write(alter,
      s"""{
         |  $elems,
         |  "sinks": [{
         |    "name": "snk", "module": "storage", "inputs": ["in"],
         |    "parameters": {"path": "${out.toString}", "format": "parquet"}
         |  }]
         |}""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // primary config references a module that doesn't exist → build
    // fails → alterConfig executes instead
    val config = s"""
      |{
      |  "system": {"failure": {"alterConfig": "${alter.toString}"}},
      |  $elems,
      |  "transforms": [
      |    {"name": "boom", "module": "nosuchmodule", "inputs": ["in"]}
      |  ]
      |}""".stripMargin
    Pipeline.execute(spark, config)
    assert(spark.read.parquet(out.toString).count() == 3)
  }

  test("alterConfig retry releases the failed attempt's " +
      "operator-persisted frames") {
    spark.catalog.clearCache()
    val dir = Files.createTempDirectory("graft-alter-rel")
    val out = dir.resolve("out")
    val alter = dir.resolve("alter.json")
    Files.write(alter,
      s"""{
         |  $elems,
         |  "sinks": [{
         |    "name": "snk", "module": "storage", "inputs": ["in"],
         |    "parameters": {"path": "${out.toString}", "format": "parquet"}
         |  }]
         |}""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // dedup ngram trackPersists candidate frames while ITS graph
    // builds; the downstream bad module then fails construction, so
    // the alterConfig retry runs — the failed attempt's persists are
    // orphans and must be released, not accreted for the session
    Pipeline.execute(spark, s"""
      |system:
      |  failure: {alterConfig: "${alter.toString}"}
      |sources:
      |  - name: docs
      |    module: storage
      |    parameters: {path: /root/testdata/sf0.001/documents.parquet}
      |transforms:
      |  - name: dd
      |    module: dedup
      |    inputs: [docs]
      |    parameters:
      |      method: ngram
      |      field: text
      |      idField: doc_id
      |      ngramSize: 5
      |      threshold: 0.7
      |  - name: boom
      |    module: select
      |    inputs: [dd]
      |    parameters:
      |      select:
      |        - {func: concat, fields: [doc_id]}
      |""".stripMargin)
    assert(spark.read.parquet(out.toString).count() == 3)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "failed attempt's cached RDDs leaked past the alterConfig " +
        "retry: " +
        spark.sparkContext.getPersistentRDDs.values.map(_.name))
  }

  test("config text may be a local file path or data: base64") {
    val dir = Files.createTempDirectory("graft-cfgfile")
    val f = dir.resolve("p.json")
    val body = s"""{$elems}"""
    Files.write(f, body.getBytes(StandardCharsets.UTF_8))
    assert(Pipeline.build(spark, f.toString)("in").count() == 3)
    val b64 = "data:" + java.util.Base64.getEncoder
      .encodeToString(body.getBytes(StandardCharsets.UTF_8))
    assert(Pipeline.build(spark, b64)("in").count() == 3)
  }

  test("pipeline-level failures section unions bad records into "
      + "declared failure sinks (system.failure.union)") {
    val dir = Files.createTempDirectory("graft-failures")
    val out = dir.resolve("badrecords")
    // two modules produce failures: a lossy cast select and a json
    // deserialize with a corrupt row; outputFailure is stamped
    // automatically when the pipeline failure handler is active
    val config = s"""
      |system:
      |  failure: {union: true}
      |sources:
      |  - name: in
      |    module: create
      |    parameters:
      |      elements:
      |        - {s: "12", j: "{\\"v\\": 1}"}
      |        - {s: "oops", j: "{\\"v\\": 2}"}
      |        - {s: "34", j: "notjson"}
      |      schema:
      |        fields:
      |          - {name: s, type: string}
      |          - {name: j, type: string}
      |transforms:
      |  - name: sel
      |    module: select
      |    inputs: [in]
      |    parameters:
      |      select:
      |        - {name: n, field: s, type: int64}
      |  - name: de
      |    module: deserialize
      |    inputs: [in]
      |    parameters:
      |      format: json
      |      field: j
      |      outputField: rec
      |      schema: {fields: [{name: v, type: int64}]}
      |sinks:
      |  - name: outmain
      |    module: memory
      |    inputs: [sel]
      |failures:
      |  - name: bad
      |    module: storage
      |    parameters: {path: "${out.toString}", format: json}
      |""".stripMargin
    Pipeline.execute(spark, config)
    val bad = spark.read.json(out.toString)
    val rows = bad.collect()
    assert(rows.nonEmpty)
    val mods = rows.map(_.getAs[String]("module")).toSet
    assert(mods.contains("sel")) // the lossy cast row
    assert(rows.forall(r => r.getAs[String]("record") != null))
  }

  test("module-scoped failures route one module's bad records "
      + "without the global union flag") {
    val dir = Files.createTempDirectory("graft-modfail")
    val out = dir.resolve("bad")
    val config = s"""
      |sources:
      |  - name: in
      |    module: create
      |    parameters:
      |      elements:
      |        - {s: "12"}
      |        - {s: "oops"}
      |      schema: {fields: [{name: s, type: string}]}
      |transforms:
      |  - name: sel
      |    module: select
      |    inputs: [in]
      |    failures:
      |      - name: bad
      |        module: storage
      |        parameters: {path: "${out.toString}", format: json}
      |    parameters:
      |      select:
      |        - {name: n, field: s, type: int64}
      |sinks:
      |  - name: outmain
      |    module: memory
      |    inputs: [sel]
      |""".stripMargin
    val dfs = Pipeline.execute(spark, config)
    assert(dfs("sel").count() == 1) // good row routed through
    val bad = spark.read.json(out.toString).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("module") == "sel")
    assert(bad.head.getAs[String]("record").contains("oops"))
  }
}

/** Small indirection so the spec can assert on resolved args without
  * widening ConfigLoader's public surface. */
object ConfigLoaderAccess {
  def resolve(text: String, args: Map[String, String]) =
    graft.config.ConfigLoader.resolve(text, args)
}