package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `multimodal` transform — image/audio/video columns for training-data
  * pipelines. Media travels as opaque `binary` columns with typed
  * metadata; per-item work (decode, feature-extract, resize,
  * frame-sample) runs in `mapPartitions` so one task amortizes
  * decoder setup across its whole partition (the Scala analogue of
  * `mapInPandas` batching).
  *
  * The actual codec call is STUBBED — image/audio libraries are not in
  * this container — behind `StubCodecs`: a deterministic fake that
  * parses our synthetic header format. The Spark-side plumbing
  * (schema evolution, partitioning, batch shape, null handling) is
  * real and tested; swapping `StubCodecs` for javacv/ImageIO is a
  * one-file change.
  *
  * Ops (config `ops: [{op, field, ...}]`):
  *  - `decode`: binary → struct(width, height, channels, format, ok)
  *  - `resize`: binary + target dims → binary (stub: re-headers)
  *  - `frame_sample`: video binary → array<binary> of n frames
  *  - `embed`: binary → array<float> feature vector (stub: seeded
  *    hash-derived, deterministic)
  */
object MultimodalTransform {

  /** Deterministic stand-ins for real codecs. Fake media format:
    * "IMG:<w>x<h>x<c>:" prefix bytes, arbitrary payload. */
  object StubCodecs {
    private val Header = """IMG:(\d+)x(\d+)x(\d+):.*""".r

    case class Meta(width: Int, height: Int, channels: Int,
        format: String, ok: Boolean)

    def decode(bytes: Array[Byte]): Meta = {
      if (bytes == null) return Meta(0, 0, 0, "null", ok = false)
      val head = new String(bytes.take(32),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      head match {
        case Header(w, h, c) => Meta(w.toInt, h.toInt, c.toInt, "img",
          ok = true)
        case _ => Meta(0, 0, 0, "unknown", ok = false)
      }
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes == null) return null
      val m = decode(bytes)
      if (!m.ok) bytes
      else s"IMG:${w}x${h}x${m.channels}:resized"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    }

    def frameSample(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      if (bytes == null) null
      else (0 until n).map(i => resize(bytes, 64, 64) ++ Array(i.toByte))

    /** ??? in spirit — deterministic fake embedding from content. */
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (bytes == null) return null
      val h = java.util.Arrays.hashCode(bytes)
      val rnd = new scala.util.Random(h)
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    }
  }

  private val metaType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("format", StringType),
    StructField("ok", BooleanType)))

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    // codec work is pure per-row CPU (decode/resize/embed): spread it
    // across cores when the input arrives under-partitioned — e.g. a
    // single small parquet split (no-op at scale / on streams)
    var df = TransformCommon.widen(TransformCommon.single(cfg, inputs))
    cfg.params.arrOf("ops").foreach { o =>
      val op = o.str("op").getOrElse("decode")
      val field = o.str("field").getOrElse("content")
      val out = o.str("name").getOrElse(s"${field}_$op")
      val inIdx = df.schema.fieldIndex(field)
      op match {
        case "decode" =>
          df = mapBinary(df, inIdx, out, metaType) { bytes =>
            val m = StubCodecs.decode(bytes)
            Row(m.width, m.height, m.channels, m.format, m.ok)
          }
        case "resize" =>
          val (w, h) = (o.int("width").getOrElse(224),
            o.int("height").getOrElse(224))
          df = mapBinary(df, inIdx, out, BinaryType)(
            StubCodecs.resize(_, w, h))
        case "frame_sample" =>
          val n = o.int("frames").getOrElse(4)
          df = mapBinary(df, inIdx, out, ArrayType(BinaryType))(
            StubCodecs.frameSample(_, n))
        case "embed" =>
          val dim = o.int("dim").getOrElse(64)
          df = mapBinary(df, inIdx, out, ArrayType(FloatType))(
            StubCodecs.embed(_, dim))
        case other =>
          throw new IllegalArgumentException(s"multimodal op: $other")
      }
    }
    TransformCommon.finishRouted(df, cfg)
  }

  /** mapPartitions with schema evolution: append `out` of type `dt`
    * computed from the binary column at `inIdx`. Codec state would be
    * initialized once per partition here (the perf point of
    * mapPartitions over a per-row UDF). */
  private def mapBinary(df: DataFrame, inIdx: Int, out: String,
      dt: DataType)(f: Array[Byte] => Any): DataFrame = {
    val outSchema = df.schema.add(out, dt)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      // per-partition codec init happens here (stub: nothing)
      it.map { row =>
        val bytes = row.get(inIdx) match {
          case b: Array[Byte] => b
          case null => null
          case other => other.toString.getBytes
        }
        Row.fromSeq(row.toSeq :+ f(bytes))
      }
    }(enc)
  }
}
