package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bucketed catalog tables — the co-located-join lever: two tables
  * bucketed on the same key with the same count must equi-join with
  * ZERO shuffle (the scan partitioning satisfies the join). */
class BucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed sink + table source join without an exchange") {
    // a previously failed run can leave the managed location behind
    // without a catalog entry — clear both
    Seq("bkt_l", "bkt_r").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val left = (1 to 5000).map(i => (i % 500, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i, i * 2.0)).toDF("k", "rv")
    def sink(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      graft.operators.StorageSink.write(
        Pipeline.ModuleCfg(name, "storage", Seq("in"), Nil,
          graft.config.Json.parse(s"""{
            "table": "$name",
            "bucketBy": {"count": 4, "fields": ["k"]},
            "sortBy": ["k"], "mode": "overwrite"}"""),
          graft.config.Json.obj()), df)
    sink("bkt_l", left)
    sink("bkt_r", right)
    def src(name: String) = Pipeline.sources("storage")(spark,
      Pipeline.ModuleCfg(name, "storage", Nil, Nil,
        graft.config.Json.parse(s"""{"table": "$name"}"""),
        graft.config.Json.obj()), Map.empty)(name)
    val l = src("bkt_l"); val r = src("bkt_r")
    // disable broadcast so the planner takes the sort-merge path the
    // bucket metadata exists for (a broadcast would also avoid the
    // shuffle, but only while one side stays driver-small)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = l.join(r, "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffles — bucket metadata was lost:\n" +
          plan)
      // left k ranges 0..499, right 1..500 → the ten k=0 rows drop
      assert(joined.count() == 4990)
      val row = joined.filter($"lv" === "l42").head
      assert(row.getAs[Double]("rv") == 84.0)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS bkt_l")
    spark.sql("DROP TABLE IF EXISTS bkt_r")
  }
}
