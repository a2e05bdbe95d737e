package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage avro container-file I/O (ops/AvroFiles): distributed
  * write via AvroKeyOutputFormat, block-splittable read via
  * AvroKeyInputFormat — no spark-avro jar involved. */
class AvroFilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  test("storage sink+source roundtrip avro container files") {
    val dir = java.nio.file.Files.createTempDirectory("avrofiles").toString
    val out = s"$dir/orders_avro"
    Pipeline.execute(spark, s"""
      |sources:
      |  - name: orders
      |    module: storage
      |    parameters: {path: "$sf/orders.parquet"}
      |transforms:
      |  - name: sel
      |    module: sql
      |    inputs: [orders]
      |    parameters:
      |      sql: "SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders"
      |sinks:
      |  - name: snk
      |    module: storage
      |    input: sel
      |    parameters: {output: "$out", format: avro}
      |""".stripMargin)

    val back = Pipeline.build(spark, s"""
      |sources:
      |  - name: rd
      |    module: storage
      |    parameters: {path: "$out", format: avro}
      |""".stripMargin)("rd")
    val orig = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    assert(back.count() === orig.count())
    assert(back.schema.fieldNames.toSeq ===
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
    // value-exact roundtrip (dates + decimals-as-double + strings)
    val h1 = orig.agg(sum(xxhash64(concat_ws("|", orig.columns.map(c =>
      col(c).cast("string")): _*)))).head.getLong(0)
    val h2 = back.agg(sum(xxhash64(concat_ws("|", back.columns.map(c =>
      col(c).cast("string")): _*)))).head.getLong(0)
    assert(h1 === h2)
  }

  test("avro read projects/casts by explicit schema param") {
    val dir = java.nio.file.Files.createTempDirectory("avrofiles2").toString
    val out = s"$dir/nation_avro"
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    graft.ops.AvroFiles.write(nation, out, None, overwrite = true)
    val back = Pipeline.build(spark, s"""
      |sources:
      |  - name: rd
      |    module: storage
      |    parameters:
      |      path: "$out"
      |      format: avro
      |      schema:
      |        fields:
      |          - {name: n_name, type: string}
      |          - {name: n_nationkey, type: int64}
      |""".stripMargin)("rd")
    assert(back.schema.fieldNames.toSeq === Seq("n_name", "n_nationkey"))
    assert(back.count() === nation.count())
  }

  test("avro sink compression actually applies (container header codec)") {
    val dir = java.nio.file.Files.createTempDirectory("avrocodec").toString
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    graft.ops.AvroFiles.write(nation, s"$dir/snappy", Some("snappy"),
      overwrite = true)
    graft.ops.AvroFiles.write(nation, s"$dir/plain", None,
      overwrite = true)
    def codecOf(d: String): String = {
      val f = new java.io.File(d).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".avro")).head
      val in = new java.io.FileInputStream(f)
      try {
        val r = new org.apache.avro.file.DataFileStream(in,
          new org.apache.avro.generic.GenericDatumReader[Any]())
        Option(r.getMetaString("avro.codec")).getOrElse("null")
      } finally in.close()
    }
    assert(codecOf(s"$dir/snappy") === "snappy")
    assert(codecOf(s"$dir/plain") === "null")
  }

  test("avro sink rejects partitionFields loudly") {
    val e = intercept[IllegalArgumentException] {
      Pipeline.execute(spark, s"""
        |sources:
        |  - name: n
        |    module: storage
        |    parameters: {path: "$sf/nation.parquet"}
        |sinks:
        |  - name: snk
        |    module: storage
        |    input: n
        |    parameters:
        |      output: "/tmp/avro_part_nope"
        |      format: avro
        |      partitionFields: [n_regionkey]
        |""".stripMargin)
    }
    assert(e.getMessage.contains("partitionFields"))
  }

  test("storage avro streaming raises the actionable slot error") {
    val e = intercept[IllegalStateException] {
      Pipeline.build(spark, s"""
        |sources:
        |  - name: rd
        |    module: storage
        |    parameters: {path: "/tmp/nope", format: avro, stream: true}
        |""".stripMargin)
    }
    assert(e.getMessage.contains("spark-avro"))
  }
}
