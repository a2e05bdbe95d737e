package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{struct, sum, xxhash64}

/** Dev-only per-stage profiler: `ProfMain <queryName> [sfDir]` runs one
  * SparkEntry query with a stage-timing listener — pinpoints which part
  * of a multi-stage plan (signature UDF, window, verify join, …)
  * carries the wall-clock. Lives in test scope so it never ships. */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val dur = for { a <- i.submissionTime; b <- i.completionTime } yield b - a
        val m = i.taskMetrics
        println(f"STAGE ${i.stageId}%3d ${dur.getOrElse(-1L)}%6d ms  " +
          f"run=${m.executorRunTime}%6d cpu=${m.executorCpuTime / 1000000}%6d " +
          f"gc=${m.jvmGCTime}%5d deser=${m.executorDeserializeTime}%5d  " +
          f"tasks=${i.numTasks}%3d  ${i.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    // two passes: pass 1 absorbs JIT/codegen first-use cost, pass 2
    // is the steady-state number a battery position would see
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.agg(sum(xxhash64(struct(df.columns.head, df.columns.tail: _*)))).collect()
      println(f"TOTAL pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
