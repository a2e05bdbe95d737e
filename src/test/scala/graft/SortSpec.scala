package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** sort transform — the range mode is the file-layout op: written
  * files must carry disjoint key ranges so scans prune on min/max. */
class SortSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sortT(params: String, df: org.apache.spark.sql.DataFrame) =
    Pipeline.transforms("sort")(spark,
      Pipeline.ModuleCfg("st", "sort", Seq("in"), Nil,
        graft.config.Json.parse(params), graft.config.Json.obj()),
      Map("in" -> df))("st")

  private lazy val rows = {
    val rnd = new scala.util.Random(7)
    (1 to 10000).map(i => (rnd.nextInt(100000), i)).toDF("k", "id")
      .repartition(8)
  }

  test("range mode: partitions carry disjoint, ordered key ranges") {
    val out = sortT(
      """{"fields": [{"field": "k"}], "numPartitions": 6}""", rows)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      "range mode lost its RangePartitioning exchange:\n" + plan)
    // per-partition (min, max) must be ordered and non-overlapping
    val ranges = out.rdd.mapPartitionsWithIndex { (i, it) =>
      val ks = it.map(_.getInt(0)).toSeq
      if (ks.isEmpty) Iterator.empty
      else Iterator((i, ks.min, ks.max, ks == ks.sorted))
    }.collect().sortBy(_._1)
    assert(ranges.forall(_._4), "a partition is not internally sorted")
    ranges.sliding(2).foreach {
      case Array((_, _, max1, _), (_, min2, _, _)) =>
        assert(max1 <= min2, s"overlapping ranges: $max1 > $min2")
      case _ =>
    }
    assert(out.count() == 10000)
  }

  test("range layout prunes at scan: a key-range filter reads a " +
      "fraction of the written rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sortprune_").toString
    sortT("""{"fields": [{"field": "k"}], "numPartitions": 6}""", rows)
      .write.mode("overwrite").parquet(dir)
    // 6 range partitions → 6 files with disjoint k ranges; a filter
    // selecting ~1/10 of the key space must let parquet row-group
    // stats skip most files, so the SCAN (not the filter above it)
    // emits far fewer than the 10000 written rows
    val read = spark.read.parquet(dir).filter(col("k") < 10000)
    val n = read.count()
    assert(n > 0)
    read.collect()
    val plan = read.queryExecution.executedPlan
    assert(plan.toString.contains("PushedFilters: [IsNotNull(k), " +
      "LessThan(k,10000)]"), plan.toString)
    val scan = plan.collectLeaves().head
    val scanned = scan.metrics("numOutputRows").value
    assert(scanned < 5000,
      s"scan emitted $scanned of 10000 rows — row-group pruning did " +
        "not engage on the range layout")
    assert(scanned >= n)
  }

  test("zorder mode: one layout prunes scans on BOTH dimensions") {
    val rnd = new scala.util.Random(11)
    val df2 = (1 to 20000).map(_ =>
      (rnd.nextInt(1024), rnd.nextInt(1024), rnd.nextInt()))
      .toDF("x", "y", "id").repartition(8)
    val params = """{"mode": "zorder", "bits": 8, "numPartitions": 16,
      "fields": [{"field": "x", "min": 0, "max": 1024},
                 {"field": "y", "min": 0, "max": 1024}]}"""
    val z = sortT(params, df2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_zprune_").toString
    z.write.mode("overwrite").parquet(dir)
    def scanned(pred: org.apache.spark.sql.Column): Long = {
      val read = spark.read.parquet(dir).filter(pred)
      read.collect()
      read.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    // a 1/16-of-keyspace filter on EITHER dimension must skip most
    // row groups — the property a single-column range layout only
    // delivers for its leading field
    val sx = scanned(col("x") < 64)
    val sy = scanned(col("y") < 64)
    assert(sx < 10000, s"x-filter scanned $sx of 20000 rows")
    assert(sy < 10000, s"y-filter scanned $sy of 20000 rows")
    // deterministic total order and intact content
    val a = z.select("x", "y", "id").collect().map(_.toSeq).toSeq
    val b = sortT(params, df2).select("x", "y", "id").collect()
      .map(_.toSeq).toSeq
    assert(a == b, "zorder order is not reproducible")
    assert(a.size == 20000)
    // omitted bounds derive from a stats pass; content stays intact
    // and the order remains deterministic
    val auto = sortT("""{"mode": "zorder", "bits": 4,
      "fields": [{"field": "x"}, {"field": "y"}]}""", df2)
      .select("x", "y", "id").collect().map(_.toSeq).toSeq
    assert(auto.size == 20000)
    assert(auto.toSet == a.toSet, "auto-bounds zorder lost rows")
  }

  test("zorder key equals a reference bit interleave (identity " +
      "scaling domain)") {
    // bounds 0..255 with 8 bits make the fixed-point scale the
    // identity, so the engine's emitted order must equal sorting by
    // a directly computed interleave of the raw values
    val rnd = new scala.util.Random(3)
    val data = (1 to 2000).map(_ => (rnd.nextInt(256), rnd.nextInt(256)))
      .distinct.map { case (x, y) => (x, y, x * 1000 + y) }
    val df3 = data.toDF("x", "y", "id").repartition(4)
    val out = sortT("""{"mode": "zorder", "bits": 8,
      "fields": [{"field": "x", "min": 0, "max": 255},
                 {"field": "y", "min": 0, "max": 255}]}""", df3)
      .select("id").collect().map(_.getInt(0)).toSeq
    def z(x: Int, y: Int): Long =
      (0 until 8).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1).toLong << (2 * i + 1)) |
          (((y >> i) & 1).toLong << (2 * i))
      }
    val expected = data.sortBy { case (x, y, _) => (z(x, y), x, y) }
      .map(_._3)
    assert(out == expected)
  }

  test("descending global sort and withinPartitions no-shuffle") {
    val out = sortT(
      """{"fields": [{"field": "k", "order": "desc"}],
         "mode": "global"}""", rows)
    val ks = out.select("k").collect().map(_.getInt(0)).toSeq
    assert(ks == ks.sortBy(-_))
    // plain (non-repartitioned) input: the only Exchange in the plan
    // would be one the sort itself added
    val wp = sortT(
      """{"fields": [{"field": "k"}], "mode": "withinPartitions"}""",
      (1 to 100).map(i => (i % 7, i)).toDF("k", "id"))
    assert(!wp.queryExecution.executedPlan.toString.contains("Exchange"),
      "withinPartitions must not shuffle")
  }

  test("shuffle mode: seed-deterministic permutation, content intact") {
    val df = (1 to 500).map(i => (i, s"d$i")).toDF("id", "t")
    def order(seed: String): Seq[Int] = sortT(
      s"""{"fields": [{"field": "id"}], "mode": "shuffle",
          "seed": "$seed", "numPartitions": 4}""", df)
      .select("id").collect().map(_.getInt(0)).toSeq
    val a = order("7"); val b = order("7"); val c = order("8")
    assert(a == b, "same seed must reproduce the permutation")
    assert(a != c, "different seeds must permute differently")
    assert(a.sorted == (1 to 500) && c.sorted == (1 to 500))
    assert(a != (1 to 500), "shuffle left the corpus in id order")
    // cross-engine reproducible: the order is md5(seed || id)
    val expected = (1 to 500).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"7$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(a == expected)
  }

  test("reshuffle by fields hash-partitions on the key") {
    val df = (1 to 100).map(i => (i % 7, i)).toDF("k", "id")
    val out = Pipeline.transforms("reshuffle")(spark,
      Pipeline.ModuleCfg("rs", "reshuffle", Seq("in"), Nil,
        graft.config.Json.parse(
          """{"fields": ["k"], "numPartitions": 5}"""),
        graft.config.Json.obj()), Map("in" -> df))("rs")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(k"), plan)
    assert(out.count() == 100)
  }

  test("streams are rejected with an actionable error") {
    val s = spark.readStream.format("rate").load()
    val e = intercept[IllegalArgumentException](sortT(
      """{"fields": [{"field": "value"}]}""", s))
    assert(e.getMessage.contains("total order"))
  }
}
