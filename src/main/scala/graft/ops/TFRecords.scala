package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** TFRecord container + tf.Example codec for the `storage`
  * source/sink `format: tfrecord` (reference
  * `sink/fileio/TFRecordSink.java` TFRecordCodec + the type mapping of
  * `converter/RowToTFRecordConverter.java`; both follow the PUBLIC
  * TensorFlow formats — record framing per
  * tensorflow/core/lib/io/record_writer, tf.Example per
  * tensorflow/core/example/{example,feature}.proto — so files
  * interoperate with tf.data readers).
  *
  * Container framing, per record:
  * `[length int64 LE][masked crc32c(length bytes) int32 LE]
  *  [payload][masked crc32c(payload) int32 LE]`,
  * `mask(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8`.
  *
  * tf.Example wire layout (field numbers from the public protos):
  * `Example{features=1}`, `Features{feature=1}` (map entry key=1
  * string, value=2 Feature), `Feature{bytes_list=1, float_list=2,
  * int64_list=3}`, each `*List{value=1}` (float/int64 packed).
  *
  * Type mapping (the reference converter's): string/bytes →
  * BytesList (utf8), float/double → FloatList (double narrows to
  * float32 — document/round on readback), int8/16/32/64 → Int64List,
  * boolean → Int64List 0/1; arrays of those → multi-value lists.
  * Null fields are skipped on encode; features absent on decode
  * surface as null. Decode REQUIRES a declared schema: tf.Example
  * carries only the three list types, not the logical ones.
  *
  * Scale note: TFRecord files have no sync markers, so a file is one
  * read task — size parallelism with `numShards` at write time, the
  * standard tf.data sharding convention.
  */
object TFRecords {

  // ---- container framing -------------------------------------------

  private def maskCrc(c: Int): Int = ((c >>> 15) | (c << 17)) + 0xa282ead8

  private def crc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    c.getValue.toInt
  }

  private def leLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def leInt(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Frame one payload (header + payload + footer). */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val len = leLong(payload.length.toLong)
    val out = new java.io.ByteArrayOutputStream(payload.length + 16)
    out.write(len)
    out.write(leInt(maskCrc(crc32c(len, 0, 8))))
    out.write(payload)
    out.write(leInt(maskCrc(crc32c(payload, 0, payload.length))))
    out.toByteArray
  }

  /** Iterate framed payloads from a stream; validates both CRCs and
    * fails loudly on corruption (a torn tail is an error, not silent
    * truncation). */
  def readFrames(in: java.io.DataInputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = _
      private var done = false
      private def advance(): Unit = {
        val header = new Array[Byte](12)
        val first = in.read(header, 0, 1)
        if (first < 0) { done = true; return }
        var off = 1
        while (off < 12) {
          val n = in.read(header, off, 12 - off)
          require(n > 0, "tfrecord: truncated record header")
          off += n
        }
        val bb = java.nio.ByteBuffer.wrap(header)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val len = bb.getLong
        val lenCrc = bb.getInt
        require(lenCrc == maskCrc(crc32c(header, 0, 8)),
          "tfrecord: length CRC mismatch (corrupt file?)")
        require(len >= 0 && len <= Int.MaxValue - 16,
          s"tfrecord: implausible record length $len")
        val payload = new Array[Byte](len.toInt)
        var p = 0
        while (p < len) {
          val n = in.read(payload, p, len.toInt - p)
          require(n > 0, "tfrecord: truncated record payload")
          p += n
        }
        val footer = new Array[Byte](4)
        var f = 0
        while (f < 4) {
          val n = in.read(footer, f, 4 - f)
          require(n > 0, "tfrecord: truncated record footer")
          f += n
        }
        val dataCrc = java.nio.ByteBuffer.wrap(footer)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        require(dataCrc == maskCrc(crc32c(payload, 0, payload.length)),
          "tfrecord: data CRC mismatch (corrupt file?)")
        nextRec = payload
      }
      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec
        nextRec = null
        r
      }
    }

  // ---- tf.Example encode -------------------------------------------

  private def floatList(vs: Seq[Float]): Array[Byte] = {
    val w = new ProtoWire.Writer
    val packed = java.nio.ByteBuffer.allocate(4 * vs.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(packed.putFloat)
    w.writeTag(1, 2)
    w.writeBytes(packed.array())
    w.toByteArray
  }

  private def int64List(vs: Seq[Long]): Array[Byte] = {
    val w = new ProtoWire.Writer
    val body = new ProtoWire.Writer
    vs.foreach(body.writeVarint)
    w.writeTag(1, 2)
    w.writeBytes(body.toByteArray)
    w.toByteArray
  }

  private def bytesList(vs: Seq[Array[Byte]]): Array[Byte] = {
    val w = new ProtoWire.Writer
    vs.foreach { b => w.writeTag(1, 2); w.writeBytes(b) }
    w.toByteArray
  }

  /** Feature message bytes for one non-null value of `dt`, or null for
    * unsupported element shapes. */
  private def featureBytes(dt: DataType, v: Any): Array[Byte] = {
    def oneof(field: Int, listBytes: Array[Byte]): Array[Byte] = {
      val w = new ProtoWire.Writer
      w.writeTag(field, 2)
      w.writeBytes(listBytes)
      w.toByteArray
    }
    dt match {
      case StringType => oneof(1, bytesList(Seq(
        v.asInstanceOf[String].getBytes("UTF-8"))))
      case BinaryType => oneof(1, bytesList(Seq(v.asInstanceOf[Array[Byte]])))
      case FloatType => oneof(2, floatList(Seq(v.asInstanceOf[Float])))
      case DoubleType => oneof(2, floatList(Seq(v.asInstanceOf[Double].toFloat)))
      case ByteType => oneof(3, int64List(Seq(v.asInstanceOf[Byte].toLong)))
      case ShortType => oneof(3, int64List(Seq(v.asInstanceOf[Short].toLong)))
      case IntegerType => oneof(3, int64List(Seq(v.asInstanceOf[Int].toLong)))
      case LongType => oneof(3, int64List(Seq(v.asInstanceOf[Long])))
      case BooleanType => oneof(3, int64List(Seq(
        if (v.asInstanceOf[Boolean]) 1L else 0L)))
      case ArrayType(et, _) =>
        val vs = v.asInstanceOf[scala.collection.Seq[Any]].toSeq
        et match {
          case StringType => oneof(1, bytesList(vs.map(x =>
            (if (x == null) "" else x.asInstanceOf[String]).getBytes("UTF-8"))))
          case BinaryType => oneof(1, bytesList(vs.map(x =>
            if (x == null) Array.empty[Byte] else x.asInstanceOf[Array[Byte]])))
          case FloatType => oneof(2, floatList(vs.map(_.asInstanceOf[Float])))
          case DoubleType => oneof(2, floatList(vs.map(
            _.asInstanceOf[Double].toFloat)))
          case IntegerType => oneof(3, int64List(vs.map(
            _.asInstanceOf[Int].toLong)))
          case LongType => oneof(3, int64List(vs.map(_.asInstanceOf[Long])))
          case BooleanType => oneof(3, int64List(vs.map(x =>
            if (x.asInstanceOf[Boolean]) 1L else 0L)))
          case other => throw new IllegalArgumentException(
            s"tfrecord: unsupported array element type $other")
        }
      case other => throw new IllegalArgumentException(
        s"tfrecord: unsupported type $other (supported: string, bytes, " +
          "float/double, int8-64, boolean, arrays thereof)")
    }
  }

  /** Encode one row as a serialized tf.Example. */
  def exampleBytes(row: Row, schema: StructType): Array[Byte] = {
    val features = new ProtoWire.Writer
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val entry = new ProtoWire.Writer
        entry.writeTag(1, 2)
        entry.writeString(schema(i).name)
        entry.writeTag(2, 2)
        entry.writeBytes(featureBytes(schema(i).dataType, row.get(i)))
        features.writeTag(1, 2)
        features.writeBytes(entry.toByteArray)
      }
      i += 1
    }
    val example = new ProtoWire.Writer
    example.writeTag(1, 2)
    example.writeBytes(features.toByteArray)
    example.toByteArray
  }

  // ---- tf.Example decode -------------------------------------------

  /** Raw feature lists of one serialized Example: name → (oneof kind,
    * list payload bytes). */
  private def parseFeatures(bytes: Array[Byte]): Map[String, (Int, Array[Byte])] = {
    val out = scala.collection.mutable.Map.empty[String, (Int, Array[Byte])]
    val top = new ProtoWire.Reader(bytes)
    while (top.hasMore) {
      val (f, wt) = top.readTag()
      if (f == 1 && wt == 2) {
        val features = new ProtoWire.Reader(top.readBytes())
        while (features.hasMore) {
          val (ff, fwt) = features.readTag()
          if (ff == 1 && fwt == 2) {
            val entry = new ProtoWire.Reader(features.readBytes())
            var name: String = null
            var kind = 0
            var list: Array[Byte] = null
            while (entry.hasMore) {
              val (ef, ewt) = entry.readTag()
              if (ef == 1 && ewt == 2) name = entry.readString()
              else if (ef == 2 && ewt == 2) {
                val feat = new ProtoWire.Reader(entry.readBytes())
                while (feat.hasMore) {
                  val (kf, kwt) = feat.readTag()
                  if (kwt == 2 && kf >= 1 && kf <= 3) {
                    kind = kf
                    list = feat.readBytes()
                  } else feat.skip(kwt)
                }
              } else entry.skip(ewt)
            }
            if (name != null && list != null) out(name) = (kind, list)
          } else features.skip(fwt)
        }
      } else top.skip(wt)
    }
    out.toMap
  }

  private def readFloats(list: Array[Byte]): Seq[Float] = {
    val out = Seq.newBuilder[Float]
    val r = new ProtoWire.Reader(list)
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      if (f == 1 && wt == 2) {
        // packed
        val packed = r.readBytes()
        val bb = java.nio.ByteBuffer.wrap(packed)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        while (bb.remaining() >= 4) out += bb.getFloat
      } else if (f == 1 && wt == 5)
        out += java.lang.Float.intBitsToFloat(r.readFixed32())
      else r.skip(wt)
    }
    out.result()
  }

  private def readInt64s(list: Array[Byte]): Seq[Long] = {
    val out = Seq.newBuilder[Long]
    val r = new ProtoWire.Reader(list)
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      if (f == 1 && wt == 2) {
        // packed
        val packed = new ProtoWire.Reader(r.readBytes())
        while (packed.hasMore) out += packed.readVarint()
      } else if (f == 1 && wt == 0) out += r.readVarint()
      else r.skip(wt)
    }
    out.result()
  }

  private def readBytesList(list: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    val r = new ProtoWire.Reader(list)
    while (r.hasMore) {
      val (f, wt) = r.readTag()
      if (f == 1 && wt == 2) out += r.readBytes()
      else r.skip(wt)
    }
    out.result()
  }

  /** Decode one serialized tf.Example into a Row of `schema`; absent
    * features decode as null. */
  def decodeExample(bytes: Array[Byte], schema: StructType): Row = {
    val feats = parseFeatures(bytes)
    val vals = schema.fields.map { f =>
      feats.get(f.name) match {
        case None => null
        case Some((kind, list)) => decodeValue(f.dataType, kind, list,
          f.name)
      }
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  private def decodeValue(dt: DataType, kind: Int, list: Array[Byte],
      name: String): Any = {
    def headOrNull[T](s: Seq[T]): Any =
      s.headOption.getOrElse(null).asInstanceOf[Any]
    dt match {
      case StringType => headOrNull(readBytesList(list)
        .map(new String(_, "UTF-8")))
      case BinaryType => headOrNull(readBytesList(list))
      case FloatType => headOrNull(readFloats(list))
      case DoubleType => headOrNull(readFloats(list).map(_.toDouble))
      case ByteType => headOrNull(readInt64s(list).map(_.toByte))
      case ShortType => headOrNull(readInt64s(list).map(_.toShort))
      case IntegerType => headOrNull(readInt64s(list).map(_.toInt))
      case LongType => headOrNull(readInt64s(list))
      case BooleanType => headOrNull(readInt64s(list).map(_ != 0L))
      case ArrayType(et, _) => et match {
        case StringType => readBytesList(list).map(new String(_, "UTF-8"))
        case BinaryType => readBytesList(list)
        case FloatType => readFloats(list)
        case DoubleType => readFloats(list).map(_.toDouble)
        case IntegerType => readInt64s(list).map(_.toInt)
        case LongType => readInt64s(list)
        case BooleanType => readInt64s(list).map(_ != 0L)
        case other => throw new IllegalArgumentException(
          s"tfrecord: unsupported array element type $other for $name")
      }
      case other => throw new IllegalArgumentException(
        s"tfrecord: unsupported type $other for $name")
    }
  }

  // ---- Spark I/O ---------------------------------------------------

  /** Distributed write: one `part-<pid>.tfrecord` per partition,
    * streamed through the Hadoop FileSystem API (local/HDFS/object
    * stores alike). Size parallelism upstream with `numShards`. */
  def write(df: DataFrame, path: String, overwrite: Boolean): Unit = {
    val st = df.schema
    val sc = df.sparkSession.sparkContext
    val target = new Path(path)
    val fs = target.getFileSystem(sc.hadoopConfiguration)
    if (overwrite && fs.exists(target)) fs.delete(target, true)
    fs.mkdirs(target)
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      sc.hadoopConfiguration)
    val pathStr = path
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val p = new Path(pathStr,
          f"part-$pid%05d-${java.util.UUID.randomUUID()}.tfrecord")
        val out = p.getFileSystem(serConf.value).create(p, true)
        try it.foreach(row =>
          out.write(frame(exampleBytes(row, st))))
        finally out.close()
      }
      Iterator.empty[Int]
    }.count()
  }

  /** Batch read: one task per FILE (the format has no sync markers);
    * records stream off the file channel, decode against the declared
    * schema. */
  def read(spark: SparkSession, paths: Seq[String],
      schema: StructType): DataFrame = {
    val rows = spark.sparkContext
      .binaryFiles(paths.mkString(","))
      .flatMap { case (_, pds) =>
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(pds.open(), 1 << 16))
        val frames = readFrames(in)
        // close the file handle when the frame iterator drains (tasks
        // iterate to exhaustion; an unclosed handle per file would
        // leak across a many-file read)
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = frames.hasNext
            if (!h) in.close()
            h
          }
          override def next(): Row = decodeExample(frames.next(), schema)
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
