package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** chunk transform — oracled end-to-end by q97; these pin the window
  * arithmetic, the reconstruction invariant, and the zero-shuffle
  * plan shape. */
class ChunkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def chunk(params: String, df: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("chunk")(spark,
      Pipeline.ModuleCfg("ck", "chunk", Seq("in"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> df))("ck")

  test("sliding windows cover the doc with the declared overlap") {
    val doc = (1 to 11).map(i => s"w$i").mkString(" ")
    val out = chunk("""{"field": "text", "size": 5, "overlap": 2}""",
      Seq((1L, doc)).toDF("id", "text"))
      .orderBy("chunk_index")
      .select("chunk", "chunk_index", "chunk_offset")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // stride 3: offsets 0,3,6 cover 11 tokens (last window short)
    assert(out.toSeq == Seq(
      ("w1 w2 w3 w4 w5", 0L, 0L),
      ("w4 w5 w6 w7 w8", 1L, 3L),
      ("w7 w8 w9 w10 w11", 2L, 6L)))
  }

  test("short docs yield exactly one chunk; reconstruction invariant " +
      "holds across a corpus") {
    val rnd = new scala.util.Random(5)
    val docs = (1 to 50).map { i =>
      (i.toLong, (1 to (1 + rnd.nextInt(90))).map(j => s"t$i-$j")
        .mkString(" "))
    }.toDF("id", "text")
    val out = chunk("""{"field": "text", "size": 16, "overlap": 4}""",
      docs)
    // every doc: dropping each chunk's first `overlap` tokens (except
    // chunk 0) and concatenating reproduces the original token stream
    val rebuilt = out
      .withColumn("part", when(col("chunk_index") === 0, col("chunk"))
        .otherwise(array_join(slice(split(col("chunk"), " "), 5, 100),
          " ")))
      .groupBy("id")
      .agg(array_join(array_sort(collect_list(struct(
        col("chunk_index"), col("part")))).getField("part"), " ")
        .as("re"))
    val bad = rebuilt.join(docs, "id")
      .filter(col("re") =!= col("text")).count()
    assert(bad == 0, s"$bad docs failed reconstruction")
    val one = out.groupBy("id").count()
      .join(docs.filter(size(split(col("text"), " ")) <= 16), "id")
    assert(one.filter(col("count") =!= 1).count() == 0,
      "a <=size doc produced more than one chunk")
  }

  test("tokensField: windows slice an existing token array " +
      "(tokenizer-exact chunking), nulls yield zero chunks") {
    val df = Seq(
      (1L, Seq("t1", "t2", "t3", "t4", "t5", "t6", "t7")),
      (2L, null: Seq[String]),
      (3L, Seq("a"))).toDF("id", "toks")
    val out = chunk(
      """{"tokensField": "toks", "size": 3, "overlap": 1}""", df)
      .orderBy("id", "chunk_index")
      .select("id", "chunk", "chunk_index", "chunk_offset")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2),
        r.getLong(3)))
    // stride 2 over 7 tokens: offsets 0,2,4 cover, last window short
    assert(out.toSeq == Seq(
      (1L, Seq("t1", "t2", "t3"), 0L, 0L),
      (1L, Seq("t3", "t4", "t5"), 1L, 2L),
      (1L, Seq("t5", "t6", "t7"), 2L, 4L),
      (3L, Seq("a"), 0L, 0L)))
    val e = intercept[IllegalArgumentException](chunk(
      """{"tokensField": "id", "size": 3}""", df))
    assert(e.getMessage.contains("array"))
  }

  test("cdc mode: chunks partition the token stream, boundaries are " +
      "content-defined (a head insertion leaves the tail chunks " +
      "identical), expected size tracks 2^bits") {
    val rnd = new scala.util.Random(7)
    val toksA = (1 to 400).map(_ => s"w${rnd.nextInt(5000)}")
    val docA = toksA.mkString(" ")
    val docB = ("INS1 INS2 INS3 INS4 INS5 " + docA)
    val df = Seq((1L, docA), (2L, docB)).toDF("id", "text")
    val out = chunk(
      """{"mode": "cdc", "field": "text", "window": 4, "bits": 4}""",
      df)
    val byDoc = out.select("id", "chunk", "chunk_index", "chunk_offset")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(2))
        .map(r => (r.getString(1), r.getLong(3))).toSeq).toMap
    // partition invariant: concatenating chunks reproduces each doc
    assert(byDoc(1L).map(_._1).mkString(" ") == docA)
    assert(byDoc(2L).map(_._1).mkString(" ") == docB)
    // offsets are the running token positions
    byDoc.values.foreach { cs =>
      cs.foldLeft(0L) { case (expOff, (txt, off)) =>
        assert(off == expOff, s"offset $off != $expOff")
        expOff + txt.split(" ").length
      }
    }
    // content-defined: past the insertion, doc B re-synchronizes to
    // doc A's chunking — the shared-suffix chunks are identical text
    // (fixed strides would shift EVERY downstream window)
    val a = byDoc(1L).map(_._1).toSet
    val shared = byDoc(2L).map(_._1).count(a.contains)
    assert(shared >= byDoc(1L).size - 2,
      s"only $shared of ${byDoc(2L).size} chunks re-synchronized")
    // expected chunk length 2^4 = 16 tokens, within a loose 3x band
    val avg = 400.0 / byDoc(1L).size
    assert(avg > 16.0 / 3 && avg < 16.0 * 3, s"avg chunk len $avg")
    val e = intercept[IllegalArgumentException](chunk(
      """{"mode": "fastcdc", "field": "text"}""", df))
    assert(e.getMessage.contains("valid"))
  }

  test("sentence mode: terminator runs close sentences, offsets are " +
      "prefix token counts, degenerate docs yield zero chunks") {
    val df = Seq(
      (1L, "Hello world. How are you? Fine... Done"),
      (2L, "..."), // punctuation-only: no [^.!?]+ run, no chunks
      (3L, null))
      .toDF("id", "text")
    val out = chunk("""{"mode": "sentence", "field": "text"}""", df)
      .orderBy("id", "chunk_index")
      .select("id", "chunk", "chunk_index", "chunk_offset")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "Hello world.", 0L, 0L),
      (1L, "How are you?", 1L, 2L),
      (1L, "Fine...", 2L, 5L),
      (1L, "Done", 3L, 6L)))
    // tokensField contradicts sentence segmentation — rejected
    val e = intercept[IllegalArgumentException](
      chunk("""{"mode": "sentence", "field": "text",
        "tokensField": "tk"}""",
        df.withColumn("tk", split(col("text"), " "))))
    assert(e.getMessage.contains("sentence mode"))
  }

  test("a null document yields zero chunks") {
    val out = chunk("""{"field": "text", "size": 4, "overlap": 1}""",
      Seq((1L, "a b c"), (2L, null: String), (3L, "d"))
        .toDF("id", "text"))
    assert(out.filter(col("id") === 2).count() == 0,
      "null text must produce no chunk rows (not one null chunk)")
    assert(out.filter(col("id") =!= 2).count() == 2)
  }

  test("chunking is streaming-safe (pure map-side plan), cdc included") {
    val s = spark.readStream.format("rate").load()
      .withColumn("text", concat_ws(" ", col("value"),
        col("value") + 1, col("value") + 2))
    val out = chunk("""{"field": "text", "size": 2, "overlap": 1}""", s)
    assert(out.isStreaming, "chunk must pass streaming frames through")
    val cdc = chunk(
      """{"mode": "cdc", "field": "text", "window": 2, "bits": 1}""", s)
    assert(cdc.isStreaming,
      "cdc chunking is per-row Column work — streams pass through")
  }

  test("zero keyed shuffle and output-name collision guard") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val plan = chunk("""{"field": "text", "size": 2}""", df)
      .queryExecution.executedPlan.toString
    // r21: narrow inputs widen through ONE round-robin exchange so
    // the per-row chunk program parallelizes; a KEYED shuffle would
    // still be a regression
    assert(!plan.contains("hashpartitioning"),
      "chunking must not key-shuffle rows:\n" + plan)
    assert(plan.toLowerCase.contains("roundrobinpartitioning"),
      "a narrow input should widen through the round-robin fan-out:\n"
        + plan)
    val e = intercept[IllegalArgumentException](chunk(
      """{"field": "text", "size": 2}""",
      df.withColumn("chunk", lit(1))))
    assert(e.getMessage.contains("collides"))
    val e2 = intercept[IllegalArgumentException](chunk(
      """{"field": "text", "size": 4, "overlap": 4}""", df))
    assert(e2.getMessage.contains("overlap"))
  }
}
