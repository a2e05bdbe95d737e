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

  /** Dynamic-destination container-file write — see
    * [[AvroFilesDynamic]] for the commit protocol (sibling staging,
    * attempt-unique files, last-attempt-wins checked renames). */
  def writeDynamic(df: DataFrame, base: String,
      destCol: org.apache.spark.sql.Column, codec: Option[String],
      overwrite: Boolean, colocate: Boolean = true): Unit =
    AvroFilesDynamic.writeDynamic(df, base, destCol, codec, overwrite,
      colocate)

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
