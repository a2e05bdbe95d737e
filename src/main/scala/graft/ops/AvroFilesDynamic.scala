package graft.ops

import org.apache.avro.{Schema => ASchema}
import org.apache.avro.generic.GenericRecord
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, struct}
import org.apache.spark.util.SerializableConfiguration

/** Dynamic-destination avro container-file write (storage sink
  * partitionFields / template destinations, reference
  * `sink/StorageSink.java:222-303`).
  *
  * Commit protocol, in order:
  *  1. tasks write attempt-unique files (`part-<pid>-a<attempt>-<run>
  *     .avro`) into a run-scoped SIBLING staging dir — the existing
  *     destination is untouched while the job runs, and concurrent
  *     attempts of one partition (speculation, zombie retries) can
  *     never interleave on one stream;
  *  2. only after the whole job succeeds: `overwrite` deletes the old
  *     base, then the driver picks the HIGHEST attempt per
  *     (destination, partition) — the one whose task Spark saw
  *     complete last — renames it to its final `part-<pid>-<run>
  *     .avro` path (each rename checked), and drops earlier attempts'
  *     leftovers;
  *  3. staging is removed — kept in place only when a rename failed
  *     (the staged files are then the only copy, and the error names
  *     the dir); cleanup failures never mask the job's own error.
  *
  * `colocate` adds the one shuffle that places each destination in a
  * single task (one file per destination); pass `colocate = false`
  * for a constant destination (plain append), where that shuffle
  * would collapse the write into one task. Unlike parquet
  * `partitionBy`, partition fields stay IN the records. Executor-side
  * filesystem access uses the session's Hadoop configuration
  * (credentials/endpoints), broadcast per job.
  *
  * Driver-side commit work is one rename per final file — with
  * `colocate` that is one per destination (plus retried attempts'
  * discards), the same order as the csv/json/parquet template path's
  * per-destination rename loop and of Spark's own v1 file committer;
  * destinations ≪ rows by construction, so the loop stays bounded at
  * scale. */
object AvroFilesDynamic {

  def writeDynamic(df: DataFrame, base: String,
      destCol: org.apache.spark.sql.Column, codec: Option[String],
      overwrite: Boolean, colocate: Boolean = true): Unit = {
    val payload = df.schema
    val json = AvroCodec.toAvroSchema(payload).toString
    val codecName = codec.filterNot(c => c == "none" || c == "null")
    val sc = df.sparkSession.sparkContext
    val hconf = sc.hadoopConfiguration
    val driverFs = new Path(base).getFileSystem(hconf)
    // qualified absolute paths: listFiles returns fully-qualified
    // paths, so relative-path arithmetic against an unqualified base
    // would silently mis-place every file
    val basePath = driverFs.makeQualified(new Path(base))
    val run = java.util.UUID.randomUUID().toString.take(8)
    // SIBLING staging: the old destination stays intact until the job
    // has succeeded, so overwrite is crash-safe (nothing is deleted
    // on a failed run)
    val parent = Option(basePath.getParent).getOrElse(basePath)
    driverFs.mkdirs(parent)
    val staging = driverFs.makeQualified(
      new Path(parent, s".graft-staging-$run-${basePath.getName}"))
    val stagingStr = staging.toString
    val bconf = new SerializableConfiguration(hconf)
    var stagedDf = df
      .select(destCol.cast(org.apache.spark.sql.types.StringType)
          .as("__dest"),
        struct(payload.fieldNames.toSeq.map(col): _*).as("__row"))
    if (colocate) stagedDf = stagedDf.repartition(col("__dest"))

    def writeTask(it: Iterator[Row]): Unit = if (it.hasNext) {
      val s = new ASchema.Parser().parse(json)
      val conf = bconf.value
      val writers = scala.collection.mutable.Map[
        String, org.apache.avro.file.DataFileWriter[GenericRecord]]()
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val attempt = tc.taskAttemptId()
      var failed: Throwable = null
      try {
        it.foreach { r =>
          val dest = Option(r.getString(0)).getOrElse("")
          val w = writers.getOrElseUpdate(dest, {
            val dir = if (dest.isEmpty) new Path(stagingStr)
              else new Path(stagingStr, dest)
            val p = new Path(dir, f"part-$pid%05d-a$attempt-$run.avro")
            val fs = p.getFileSystem(conf)
            val dfw = new org.apache.avro.file.DataFileWriter[
              GenericRecord](
              new org.apache.avro.generic.GenericDatumWriter[
                GenericRecord](s))
            codecName.foreach(c => dfw.setCodec(
              org.apache.avro.file.CodecFactory.fromString(c)))
            dfw.create(s, fs.create(p, true))
            dfw
          })
          w.append(AvroCodec.rowToRecord(r.getStruct(1), payload, s))
        }
      } catch { case t: Throwable => failed = t; throw t }
      finally {
        // close() flushes each writer's final buffered block — a
        // failure IS data loss and must fail the task, but every
        // writer still gets closed (no leaked streams/leases)
        writers.values.foreach { w =>
          try w.close()
          catch {
            case t: Throwable => if (failed == null) failed = t
          }
        }
        if (failed != null) throw failed
      }
    }

    var renameFailed = false
    try {
      stagedDf.foreachPartition(writeTask _)
      // ---- job succeeded; commit ----
      if (overwrite && driverFs.exists(basePath))
        driverFs.delete(basePath, true)
      if (driverFs.exists(staging)) {
        // highest attempt per (destination, partition) wins — it is
        // the attempt whose completion Spark recorded; earlier
        // attempts' files (partial or complete) are dropped
        val staged = scala.collection.mutable.ArrayBuffer[
          (String, Int, Long, Path)]()
        val AttemptName = """part-(\d+)-a(\d+)-.*\.avro""".r
        val files = driverFs.listFiles(staging, true)
        val stagingPrefix = staging.toUri.getPath
        while (files.hasNext) {
          val f = files.next()
          if (f.isFile) {
            val rel = f.getPath.toUri.getPath
              .stripPrefix(stagingPrefix).stripPrefix("/")
            val dir = rel.lastIndexOf('/') match {
              case -1 => ""
              case i => rel.substring(0, i)
            }
            f.getPath.getName match {
              case AttemptName(p, a) =>
                staged += ((dir, p.toInt, a.toLong, f.getPath))
              case _ => // foreign file in staging: ignore
            }
          }
        }
        staged.groupBy(e => (e._1, e._2)).foreach {
          case ((dir, pid), attempts) =>
            val winner = attempts.maxBy(_._3)._4
            val targetDir =
              if (dir.isEmpty) basePath else new Path(basePath, dir)
            driverFs.mkdirs(targetDir)
            val target = new Path(targetDir,
              f"part-$pid%05d-$run.avro")
            if (!driverFs.rename(winner, target)) {
              renameFailed = true
              throw new java.io.IOException(
                s"avro write: rename $winner -> $target failed; " +
                  s"output left staged under $staging")
            }
        }
      }
    } finally {
      // cleanup must never mask the real error; staging is preserved
      // only when a rename failed (staged files are the only copy)
      if (!renameFailed)
        try {
          if (driverFs.exists(staging)) driverFs.delete(staging, true)
        } catch { case _: Throwable => }
    }
  }
}
