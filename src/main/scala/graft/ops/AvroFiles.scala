package graft.ops

import org.apache.avro.{Schema => ASchema}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.file.DataFileStream
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Avro object-container file I/O for the `storage` source/sink
  * (reference `source/StorageSource.java:88-93,284-340` and
  * `sink/StorageSink.java:152-165` avro branches).
  *
  * Built on avro-core + avro-mapred (both bundled with Spark) instead
  * of the spark-avro module, which does not ship in this image. The
  * Hadoop input format splits files on Avro sync-marker blocks, so a
  * multi-GB file fans out across tasks exactly like any other Hadoop
  * splittable format — reads scale with input size, not file count.
  * Writes go through the matching output format: one container file
  * per partition, standard `avro.output.codec` compression.
  *
  * Caveats vs spark-avro (documented in README deviations): no
  * filter pushdown (Avro is row-major; spark-avro gains little there
  * either) and column pruning happens after decode, not inside it.
  */
object AvroFiles {

  /** Batch-read container files; schema comes from the first file's
    * writer header (one driver-side header read — not a data scan).
    * Files whose schema has drifted resolve against it by Avro
    * schema-resolution rules. An explicit `schema` param projects /
    * casts by name after decode. */
  def read(spark: SparkSession, paths: Seq[String],
      schemaOpt: Option[StructType]): DataFrame = {
    val sc = spark.sparkContext
    val writerSchema = headerSchema(sc.hadoopConfiguration, paths)
    val json = writerSchema.toString
    val hconf = new Configuration(sc.hadoopConfiguration)
    hconf.set("avro.schema.input.key", json)
    val rdd = sc.newAPIHadoopFile(paths.mkString(","),
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable], hconf)
    val st = AvroCodec.toStructType(json)
    // convert inside the scan stage: the record reader reuses its
    // AvroKey holder, so the datum must not escape the iterator step
    val rows = rdd.mapPartitions { it =>
      val s = new ASchema.Parser().parse(json)
      val stLocal = AvroCodec.toStructType(json)
      it.map { case (k, _) => AvroCodec.recordToRow(k.datum(), s, stLocal) }
    }
    var df = spark.createDataFrame(rows, st)
    schemaOpt.foreach { want =>
      df = df.select(want.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType)): _*)
    }
    df
  }

  /** Distributed container-file write: one file per partition via the
    * Hadoop output format. `codec`: null/deflate/snappy/bzip2/xz. */
  def write(df: DataFrame, path: String, codec: Option[String],
      overwrite: Boolean): Unit = {
    val st = df.schema
    val avroSchema = AvroCodec.toAvroSchema(st)
    val json = avroSchema.toString
    val sc = df.sparkSession.sparkContext
    val hconf = new Configuration(sc.hadoopConfiguration)
    hconf.set("avro.schema.output.key", json)
    codec.filterNot(c => c == "none" || c == "null").foreach { c =>
      // AvroKeyOutputFormat consults avro.output.codec only when the
      // generic FileOutputFormat compress switch is on (default off)
      // — without this the codec request is silently ignored and
      // files come out uncompressed
      hconf.setBoolean("mapreduce.output.fileoutputformat.compress", true)
      hconf.set("avro.output.codec", c)
    }
    val target = new Path(path)
    if (overwrite) {
      val fs = target.getFileSystem(sc.hadoopConfiguration)
      if (fs.exists(target)) fs.delete(target, true)
    }
    val pairs = df.rdd.mapPartitions { it =>
      val s = new ASchema.Parser().parse(json)
      it.map(row => (new AvroKey[GenericRecord](
        AvroCodec.rowToRecord(row, st, s)), NullWritable.get()))
    }
    pairs.saveAsNewAPIHadoopFile(path, classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
      hconf)
  }

  /** Dynamic-destination container-file write (storage sink
    * partitionFields / template destinations, reference
    * `sink/StorageSink.java:222-303`): each row's `destCol` renders a
    * base-relative subdirectory; with `colocate` one shuffle places
    * each destination in one task, then every task streams one
    * container file per destination it holds through
    * `DataFileWriter` — a single distributed job regardless of
    * destination count. Tasks write into a run-scoped STAGING dir and
    * the driver moves files into place only after the whole job
    * succeeds (checked renames), so failed/retried task attempts
    * never leave partial or duplicate files at final paths: an
    * attempt re-creates its staged file with overwrite, and staging
    * is deleted on any failure. File names are run+partition unique,
    * so `overwrite = false` appends safely next to prior runs. An
    * empty rendered destination writes directly under `base` (plain
    * append mode — pass `colocate = false` there, a constant
    * destination would collapse the shuffle to one task). Unlike
    * parquet `partitionBy`, partition fields stay IN the records —
    * avro readers get full rows without path reconstruction. */
  def writeDynamic(df: DataFrame, base: String,
      destCol: org.apache.spark.sql.Column, codec: Option[String],
      overwrite: Boolean, colocate: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.struct
    val payload = df.schema
    val json = AvroCodec.toAvroSchema(payload).toString
    val codecName = codec.filterNot(c => c == "none" || c == "null")
    val sc = df.sparkSession.sparkContext
    val basePath = new Path(base)
    val driverFs = basePath.getFileSystem(sc.hadoopConfiguration)
    if (overwrite && driverFs.exists(basePath))
      driverFs.delete(basePath, true)
    val run = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(basePath, s".graft-staging-$run")
    val stagingStr = staging.toString
    var staged = df
      .select(destCol.cast(org.apache.spark.sql.types.StringType)
          .as("__dest"),
        struct(payload.fieldNames.toSeq.map(col): _*).as("__row"))
    if (colocate) staged = staged.repartition(col("__dest"))
    try {
      staged.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val s = new ASchema.Parser().parse(json)
          val conf = new Configuration()
          val writers = scala.collection.mutable.Map[
            String, org.apache.avro.file.DataFileWriter[GenericRecord]]()
          val pid = org.apache.spark.TaskContext.getPartitionId()
          var failed: Throwable = null
          try {
            it.foreach { r =>
              val dest = Option(r.getString(0)).getOrElse("")
              val w = writers.getOrElseUpdate(dest, {
                val dir = if (dest.isEmpty) new Path(stagingStr)
                  else new Path(stagingStr, dest)
                // run+partition naming (no attempt id): a RETRIED
                // attempt recreates the same staged file with
                // overwrite=true instead of stacking a duplicate
                val p = new Path(dir, f"part-$pid%05d-$run.avro")
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
          finally writers.values.foreach { w =>
            // close() flushes the final buffered block — a failure
            // here IS data loss and must fail the task (unless the
            // task is already failing, where close is best-effort
            // cleanup)
            try w.close()
            catch { case t: Throwable => if (failed == null) throw t }
          }
        }
      }
      // job succeeded: move every staged file into the final layout,
      // checking each rename (a silent false would lose the file
      // when staging is deleted below)
      if (driverFs.exists(staging)) {
        val files = driverFs.listFiles(staging, true)
        val stagingUri = staging.toUri.getPath
        while (files.hasNext) {
          val f = files.next()
          if (f.isFile) {
            val rel = f.getPath.toUri.getPath.stripPrefix(stagingUri)
              .stripPrefix("/")
            val target = new Path(basePath, rel)
            Option(target.getParent).foreach(driverFs.mkdirs)
            if (!driverFs.rename(f.getPath, target)) {
              // do NOT fall through to the cleanup below — the
              // un-moved files are the only copy of this run's data
              throw new StagedRenameException(
                s"avro write: rename ${f.getPath} -> $target failed; " +
                  s"output left staged under $staging")
            }
          }
        }
        driverFs.delete(staging, true)
      }
    } catch {
      case e: StagedRenameException => throw e
      case e: Throwable =>
        // failed job/attempt leftovers must not pollute the layout
        if (driverFs.exists(staging)) driverFs.delete(staging, true)
        throw e
    }
  }

  /** Rename-phase failure: staging is intentionally preserved. */
  private final class StagedRenameException(msg: String)
    extends java.io.IOException(msg)

  /** Writer schema of the first non-empty data file under `paths`
    * (literal file, directory, or glob). */
  private def headerSchema(conf: Configuration,
      paths: Seq[String]): ASchema = {
    val files = paths.iterator.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
        .flatMap { s =>
          if (s.isDirectory)
            fs.listStatus(s.getPath).toSeq.filter(_.isFile)
          else Seq(s)
        }
    }.filter { s =>
      val n = s.getPath.getName
      s.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
    }
    val first = files.nextOption().getOrElse(
      throw new IllegalArgumentException(
        s"storage avro: no data files at ${paths.mkString(", ")}"))
    val in = first.getPath.getFileSystem(conf).open(first.getPath)
    try
      new DataFileStream(in,
        new GenericDatumReader[GenericRecord]()).getSchema
    finally in.close()
  }
}
