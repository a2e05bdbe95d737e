package graft.operators

import graft.Pipeline.ModuleCfg
import graft.config.Json._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `multimodal` transform — image/audio/video columns for training-data
  * pipelines. Media travels as opaque `binary` columns with typed
  * metadata; per-item work (generate, decode, feature-extract, resize,
  * frame-sample) runs in `mapPartitions` so one task amortizes
  * decoder setup across its whole partition (the Scala analogue of
  * `mapInPandas` batching).
  *
  * IMAGE codecs are REAL: `javax.imageio` (in the JDK — zero new
  * dependencies) decodes PNG/JPEG/GIF/BMP, `resize` rescales through
  * `Graphics2D` and re-encodes PNG, and formats sniff from magic
  * bytes. `frame_sample` is real over the JDK's one multi-frame
  * container (animated GIF; stills read as one frame); true video
  * codecs (mp4/webm) are not in the JDK, so those bytes degrade to
  * null. The synthetic `IMG:<w>x<h>x<c>:` header format is kept as a
  * fallback codec (`StubCodecs`) so byte fixtures stay cheap to
  * construct.
  *
  * AUDIO codecs are real too: `javax.sound.sampled` (also JDK)
  * decodes WAV/AIFF container metadata and `generate_wav` produces
  * deterministic PCM fixtures; compressed audio (mp3/ogg) has no JDK
  * codec and degrades to ok=false.
  *
  * Ops (config `ops: [{op, field, ...}]`):
  *  - `generate`: (widthField, heightField, seedField) → binary —
  *    a REAL PNG with a deterministic per-(seed, x, y) pixel fill,
  *    the fixture generator for decode/resize pipelines.
  *  - `decode`: binary → struct(width, height, channels, format, ok)
  *  - `resize`: binary + target dims → binary (real rescale + PNG
  *    re-encode for real images; re-header for IMG: fixtures)
  *  - `generate_wav`: (framesField, seedField, sampleRate) → binary —
  *    a REAL PCM-16 mono WAV with deterministic samples.
  *  - `audio_meta`: binary → struct(sample_rate, channels, frames,
  *    bits, format, ok) via the JDK WAV/AIFF readers.
  *  - `generate_gif`: (widthField, heightField, framesField,
  *    seedField) → binary — a REAL animated GIF, the JDK's one
  *    writable multi-frame container (the video fixture generator).
  *  - `frame_sample`: multi-frame binary → array<binary> of
  *    min(n, frames) evenly-spaced frames, re-encoded RGB PNG —
  *    REAL for GIF/stills via ImageIO; true video codecs (mp4/webm)
  *    are not in the JDK, so those bytes degrade to null
  *  - `embed`: binary → array<float> feature vector. With a `model`,
  *    the bytes REALLY decode (ImageIO) to a grid×grid normalized
  *    RGB pixel tensor and run batched through the `onnx`
  *    transform's pluggable Session seam ([[OnnxTransform
  *    .sessionFactory]]) — a real vision encoder is a jar drop-in,
  *    and `model: stub:linear` exercises the full chain
  *    deterministically. Without a `model`, a content-hash-seeded
  *    deterministic stand-in vector.
  */
object MultimodalTransform {

  /** Deterministic stand-ins where no JDK codec exists. Fake media
    * format: "IMG:<w>x<h>x<c>:" prefix bytes, arbitrary payload. */
  object StubCodecs {
    private val Header = """IMG:(\d+)x(\d+)x(\d+):.*""".r

    case class Meta(width: Int, height: Int, channels: Int,
        format: String, ok: Boolean)

    def headerMeta(bytes: Array[Byte]): Option[Meta] = {
      if (bytes == null) return None
      val head = new String(bytes.take(32),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      head match {
        case Header(w, h, c) =>
          Some(Meta(w.toInt, h.toInt, c.toInt, "img", ok = true))
        case _ => None
      }
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      headerMeta(bytes) match {
        case Some(m) =>
          s"IMG:${w}x${h}x${m.channels}:resized"
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        case None => bytes
      }

    /** IMG: fixture path of frame sampling (n re-headered thumbs,
      * index-tagged) — real containers route through
      * [[ImageCodecs.frameSample]]. */
    def frameSampleStub(bytes: Array[Byte], n: Int): Seq[Array[Byte]] =
      if (bytes == null) null
      else (0 until n).map(i =>
        ImageCodecs.resize(bytes, 64, 64) ++ Array(i.toByte))

    /** Deterministic fake embedding from content (a real vision
      * encoder slots in here — ONNX models route through the `onnx`
      * transform instead). */
    def embed(bytes: Array[Byte], dim: Int): Array[Float] = {
      if (bytes == null) return null
      val h = java.util.Arrays.hashCode(bytes)
      val rnd = new scala.util.Random(h)
      Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
    }
  }

  /** Real JDK image codecs: magic-byte sniffing + `javax.imageio`
    * decode/encode. All methods are pure functions of their inputs
    * (Java2D software rasterization and the PNG writer are
    * deterministic), so outputs replay across runs and engines. */
  object ImageCodecs {
    import StubCodecs.Meta

    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache

    /** Magic-byte format sniff — cheaper and stricter than letting
      * ImageIO probe every registered reader. */
    def sniff(bytes: Array[Byte]): Option[String] = {
      if (bytes == null || bytes.length < 8) return None
      def b(i: Int) = bytes(i) & 0xff
      if (b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
        Some("png")
      else if (b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff)
        Some("jpeg")
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
        Some("gif")
      else if (b(0) == 'B' && b(1) == 'M') Some("bmp")
      else None
    }

    private def read(bytes: Array[Byte])
        : Option[java.awt.image.BufferedImage] =
      // NonFatal, not just IOException: ImageIO plugins throw
      // ArrayIndexOutOfBounds/NegativeArraySize/CMMException on
      // malformed input — a corrupt image is DATA (ok=false), and
      // must never 4x-fail the task
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

    private def writePng(img: java.awt.image.BufferedImage)
        : Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** binary → (width, height, channels, format, ok). Synthetic
      * IMG: fixtures decode through their header; real images sniff
      * then decode; anything else is (0,0,0,"unknown",false) —
      * never a throw, a corrupt image is data, not a bug. */
    def decode(bytes: Array[Byte]): Meta = {
      if (bytes == null) return Meta(0, 0, 0, "null", ok = false)
      StubCodecs.headerMeta(bytes).getOrElse {
        sniff(bytes) match {
          case Some(fmt) => read(bytes) match {
            case Some(img) => Meta(img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, fmt, ok = true)
            case None => Meta(0, 0, 0, fmt, ok = false) // truncated
          }
          case None => Meta(0, 0, 0, "unknown", ok = false)
        }
      }
    }

    /** Real rescale (bilinear, software raster — deterministic),
      * re-encoded PNG; IMG: fixtures re-header; undecodable bytes
      * pass through unchanged (the decode op marks them !ok). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes == null) return null
      if (StubCodecs.headerMeta(bytes).isDefined)
        return StubCodecs.resize(bytes, w, h)
      read(bytes) match {
        case Some(src) =>
          val kind =
            if (src.getColorModel.hasAlpha)
              java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB
          writePng(scaleTo(src, w, h, kind))
        case None => bytes
      }
    }

    private def scaleTo(src: java.awt.image.BufferedImage, w: Int,
        h: Int, kind: Int): java.awt.image.BufferedImage = {
      val dst = new java.awt.image.BufferedImage(w, h, kind)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      dst
    }

    /** Decode → (rescale to grid×grid if needed) → row-major
      * normalized RGB tensor: element 3·(y·grid+x)+c is channel c
      * (r, g, b) of pixel (x, y) scaled by /255.0 — the standard
      * vision-encoder preprocessing shape. Images ALREADY at
      * grid×grid skip the rescale, so fixture pixels reach the model
      * bit-exactly (the SQL-replayable path); undecodable bytes →
      * null (the row degrades to a null embedding, never a throw). */
    def pixelTensor(bytes: Array[Byte], grid: Int): Array[Double] = {
      if (bytes == null) return null
      if (sniff(bytes).isEmpty) return null
      read(bytes) match {
        case None => null
        case Some(img0) =>
          val img =
            if (img0.getWidth == grid && img0.getHeight == grid) img0
            else scaleTo(img0, grid, grid,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
          val t = new Array[Double](grid * grid * 3)
          var y = 0
          while (y < grid) {
            var x = 0
            while (x < grid) {
              val p = img.getRGB(x, y)
              val i = 3 * (y * grid + x)
              t(i) = ((p >> 16) & 0xff) / 255.0
              t(i + 1) = ((p >> 8) & 0xff) / 255.0
              t(i + 2) = (p & 0xff) / 255.0
              x += 1
            }
            y += 1
          }
          t
      }
    }

    /** Deterministic REAL PNG: w×h RGB, pixel (x, y) a pure function
      * of (seed, x, y) — the fixture generator that lets decode/
      * resize gates run on genuine codec output with a SQL-replayable
      * expectation (the oracle predicts dimensions, not pixels). */
    def generatePng(w: Int, h: Int, seed: Long): Array[Byte] =
      writePng(fill(w, h, seed))

    private def fill(w: Int, h: Int,
        seed: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            (((seed * 1103515245L + x * 31L + y * 977L) >>> 8)
              & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      img
    }

    /** Deterministic REAL multi-frame container: an animated GIF
      * with `frames` frames (frame f seeded by seed + f) — GIF is
      * the one multi-frame format the JDK can both write and read,
      * so frame sampling runs on genuine video-shaped input. */
    def generateGif(w: Int, h: Int, frames: Int,
        seed: Long): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < frames) {
          writer.writeToSequence(
            new javax.imageio.IIOImage(fill(w, h, seed + f),
              null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** REAL frame sampling: read the container's frame count via the
      * ImageIO reader (animated GIF = the multi-frame case; stills =
      * one frame), pick min(n, count) evenly-spaced frames and
      * re-encode each as an RGB PNG (palette frames convert, so a
      * downstream decode sees deterministic 3-channel output).
      *
      * Frames COMPOSITE: optimized GIFs store later frames as delta
      * rects at a canvas offset (the gifsicle/giphy default), so
      * each raw raster draws onto a running logical-screen-sized
      * canvas at its descriptor offset and the CANVAS is what
      * samples — a delta frame yields the full composed image, not
      * a fragment. Per-frame DISPOSAL from the
      * GraphicControlExtension is honored: restoreToBackgroundColor
      * clears the frame's rect after sampling (to black — the RGB
      * canvas's stand-in for the transparent background most
      * decoders use) and restoreToPrevious rewinds the canvas to
      * its pre-draw state, so optimized real-world GIFs that rely
      * on disposal don't leak stale pixels into later samples.
      * Reaching sampled frame k therefore decodes frames
      * 0..k — one sequential pass up to the LAST sampled index.
      *
      * n is validated ≥ 1 at config time (the op's `frames` knob).
      * IMG: fixtures keep the stub path; undecodable bytes → null. */
    def frameSample(bytes: Array[Byte], n: Int)
        : Seq[Array[Byte]] = {
      if (bytes == null) return null
      if (StubCodecs.headerMeta(bytes).isDefined)
        return StubCodecs.frameSampleStub(bytes, n)
      if (sniff(bytes).isEmpty) return null
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); return null }
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val count = reader.getNumImages(true)
          if (count <= 0) return null
          val take = math.min(n, count)
          // Long arithmetic: i*(count-1) overflows Int past ~46k
          // frames, corrupting the index set silently
          val wanted = (0 until take).map { i =>
            if (take == 1) 0
            else (i.toLong * (count - 1) / (take - 1)).toInt
          }
          // logical screen size (the compose canvas); still formats
          // and plain GIFs fall back to the first frame's dims via
          // the header peek (getWidth/getHeight decode no pixels)
          val (cw, ch) = logicalScreen(reader).getOrElse(
            (reader.getWidth(0), reader.getHeight(0)))
          // Set, not the Seq: `contains` inside the decode loop was
          // a linear scan — O(frames × take) comparisons per row
          val wantedSet = wanted.toSet
          var canvas: java.awt.image.BufferedImage = null
          val out = scala.collection.mutable.ArrayBuffer
            .empty[Array[Byte]]
          var idx = 0
          while (idx <= wanted.last) {
            val src = reader.read(idx)
            if (canvas == null)
              canvas = new java.awt.image.BufferedImage(
                math.max(cw, src.getWidth),
                math.max(ch, src.getHeight),
                java.awt.image.BufferedImage.TYPE_INT_RGB)
            val (ox, oy) = frameOffset(reader, idx)
            val disposal = frameDisposal(reader, idx)
            // restoreToPrevious needs the pre-draw canvas back after
            // this frame displays: snapshot only when that mode asks
            val prev: java.awt.image.BufferedImage =
              if (disposal == "restoreToPrevious") copyCanvas(canvas)
              else null
            val g = canvas.createGraphics()
            try g.drawImage(src, ox, oy, null) finally g.dispose()
            if (wantedSet.contains(idx)) out += writePng(canvas)
            // disposal applies AFTER the frame displays (and after
            // sampling), before the next frame draws
            disposal match {
              case "restoreToBackgroundColor" =>
                val gd = canvas.createGraphics()
                try {
                  gd.setColor(java.awt.Color.BLACK)
                  gd.fillRect(ox, oy, src.getWidth, src.getHeight)
                } finally gd.dispose()
              case "restoreToPrevious" => canvas = prev
              case _ => () // none / doNotDispose: keep the canvas
            }
            idx += 1
          }
          out.toSeq
        } finally { reader.dispose(); iis.close() }
      } catch { case scala.util.control.NonFatal(_) => null }
    }

    /** GIF logical screen (canvas) dims from the stream metadata;
      * None for formats without one. */
    private def logicalScreen(reader: javax.imageio.ImageReader)
        : Option[(Int, Int)] =
      try {
        val md = reader.getStreamMetadata
        if (md == null) return None
        md.getAsTree("javax_imageio_gif_stream_1.0") match {
          case root: org.w3c.dom.Element =>
            val nodes = root.getElementsByTagName(
              "LogicalScreenDescriptor")
            if (nodes.getLength == 0) None
            else {
              val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
              Some((d.getAttribute("logicalScreenWidth").toInt,
                d.getAttribute("logicalScreenHeight").toInt))
            }
          case _ => None
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Per-frame disposal method from the GIF
      * GraphicControlExtension ("none" | "doNotDispose" |
      * "restoreToBackgroundColor" | "restoreToPrevious");
      * "none" when absent or unreadable. */
    private def frameDisposal(reader: javax.imageio.ImageReader,
        idx: Int): String =
      try {
        val md = reader.getImageMetadata(idx)
        if (md == null) return "none"
        md.getAsTree("javax_imageio_gif_image_1.0") match {
          case root: org.w3c.dom.Element =>
            val nodes = root.getElementsByTagName(
              "GraphicControlExtension")
            if (nodes.getLength == 0) "none"
            else nodes.item(0).asInstanceOf[org.w3c.dom.Element]
              .getAttribute("disposalMethod")
          case _ => "none"
        }
      } catch { case scala.util.control.NonFatal(_) => "none" }

    /** 1:1 snapshot — scaleTo at identity dims (the bilinear hint
      * is a no-op at 1:1). */
    private def copyCanvas(src: java.awt.image.BufferedImage)
        : java.awt.image.BufferedImage =
      scaleTo(src, src.getWidth, src.getHeight, src.getType)

    /** Per-frame canvas offset from the GIF image descriptor;
      * (0, 0) when absent. */
    private def frameOffset(reader: javax.imageio.ImageReader,
        idx: Int): (Int, Int) =
      try {
        val md = reader.getImageMetadata(idx)
        if (md == null) return (0, 0)
        md.getAsTree("javax_imageio_gif_image_1.0") match {
          case root: org.w3c.dom.Element =>
            val nodes = root.getElementsByTagName("ImageDescriptor")
            if (nodes.getLength == 0) (0, 0)
            else {
              val d = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
              (d.getAttribute("imageLeftPosition").toInt,
                d.getAttribute("imageTopPosition").toInt)
            }
          case _ => (0, 0)
        }
      } catch { case scala.util.control.NonFatal(_) => (0, 0) }
  }

  /** Real JDK audio codecs: `javax.sound.sampled` decodes WAV and
    * AIFF container headers (zero new dependencies). Compressed
    * formats (mp3/ogg) have no JDK codec — they sniff to
    * (0,0,0,format,false) like a truncated image does. */
  object AudioCodecs {
    case class AudioMeta(sampleRate: Int, channels: Int, frames: Long,
        bits: Int, format: String, ok: Boolean)

    /** Container sniff from magic bytes (RIFF/WAVE, FORM/AIFF). */
    def sniffAudio(bytes: Array[Byte]): Option[String] = {
      if (bytes == null || bytes.length < 12) return None
      val head = new String(bytes.take(12),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      if (head.startsWith("RIFF") && head.substring(8) == "WAVE")
        Some("wav")
      else if (head.startsWith("FORM") &&
          head.substring(8).startsWith("AIF")) Some("aiff")
      else None
    }

    def decode(bytes: Array[Byte]): AudioMeta = {
      if (bytes == null)
        return AudioMeta(0, 0, 0L, 0, "null", ok = false)
      val fmt = sniffAudio(bytes)
      if (fmt.isEmpty)
        return AudioMeta(0, 0, 0L, 0, "unknown", ok = false)
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          AudioMeta(f.getSampleRate.toInt, f.getChannels,
            in.getFrameLength, f.getSampleSizeInBits, fmt.get,
            ok = true)
        } finally in.close()
      } catch {
        // UnsupportedAudioFileException + any parser RuntimeException
        // on truncated/crafted headers: corrupt audio is DATA
        case scala.util.control.NonFatal(_) =>
          AudioMeta(0, 0, 0L, 0, fmt.get, ok = false)
      }
    }

    /** Deterministic REAL WAV: PCM signed 16-bit mono, sample i a
      * pure function of (seed, i) — the audio twin of
      * [[ImageCodecs.generatePng]] (the oracle predicts frame count
      * and format fields, not samples). */
    def generateWav(frames: Int, sampleRate: Int,
        seed: Long): Array[Byte] = {
      val pcm = new Array[Byte](frames * 2)
      var i = 0
      while (i < frames) {
        val s = (((seed * 1103515245L + i * 12345L) >>> 8) & 0xffff)
          .toInt - 32768
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
  }

  private val metaType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("format", StringType),
    StructField("ok", BooleanType)))

  private val audioMetaType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("frames", LongType), StructField("bits", IntegerType),
    StructField("format", StringType), StructField("ok", BooleanType)))

  def build(spark: SparkSession, cfg: ModuleCfg,
      inputs: Map[String, DataFrame]): Map[String, DataFrame] = {
    // codec work is pure per-row CPU (decode/resize/embed): spread it
    // across cores when the input arrives under-partitioned — e.g. a
    // single small parquet split (no-op at scale / on streams)
    var df = TransformCommon.widen(TransformCommon.single(cfg, inputs))
    cfg.params.arrOf("ops").foreach { o =>
      val op = o.str("op").getOrElse("decode")
      val out = o.str("name").getOrElse(
        s"${o.str("field").getOrElse("content")}_$op")
      op match {
        case "generate" =>
          val wIdx = df.schema.fieldIndex(
            o.str("widthField").getOrElse("width"))
          val hIdx = df.schema.fieldIndex(
            o.str("heightField").getOrElse("height"))
          val sIdx = o.str("seedField").map(df.schema.fieldIndex)
          df = mapRows(df, out, BinaryType) { row =>
            // invalid dims are DATA (per-row columns), and degrade
            // to null like the null-dims path — zero/negative/
            // unparseable/absurd values must not kill the job
            (for {
              w <- boundedInt(row, wIdx, maxPngDim)
              h <- boundedInt(row, hIdx, maxPngDim)
            } yield
              try ImageCodecs.generatePng(w, h, seedOf(row, sIdx))
              catch { case scala.util.control.NonFatal(_) => null }
            ).orNull
          }
        case "generate_gif" =>
          val wIdx = df.schema.fieldIndex(
            o.str("widthField").getOrElse("width"))
          val hIdx = df.schema.fieldIndex(
            o.str("heightField").getOrElse("height"))
          val fIdx = df.schema.fieldIndex(
            o.str("framesField").getOrElse("frames"))
          val sIdx = o.str("seedField").map(df.schema.fieldIndex)
          df = mapRows(df, out, BinaryType) { row =>
            (for {
              w <- boundedInt(row, wIdx, maxPngDim)
              h <- boundedInt(row, hIdx, maxPngDim)
              frames <- boundedInt(row, fIdx, maxGifFrames)
              // COMBINED ceiling: each bound can pass individually
              // while the product demands gigabytes — and the OOM
              // that would follow is an Error NonFatal cannot catch
              if w.toLong * h * frames <= maxGifPixelFrames
            } yield
              try ImageCodecs.generateGif(w, h, frames,
                seedOf(row, sIdx))
              catch { case scala.util.control.NonFatal(_) => null }
            ).orNull
          }
        case "generate_wav" =>
          val fIdx = df.schema.fieldIndex(
            o.str("framesField").getOrElse("frames"))
          val sIdx = o.str("seedField").map(df.schema.fieldIndex)
          val rate = o.int("sampleRate").getOrElse(16000)
          df = mapRows(df, out, BinaryType) { row =>
            (for (frames <- boundedInt(row, fIdx, maxWavFrames))
              yield
                try AudioCodecs.generateWav(frames, rate,
                  seedOf(row, sIdx))
                catch { case scala.util.control.NonFatal(_) => null }
            ).orNull
          }
        case _ =>
          val field = o.str("field").getOrElse("content")
          val inIdx = df.schema.fieldIndex(field)
          op match {
            case "audio_meta" =>
              df = mapBinary(df, inIdx, out, audioMetaType) { bytes =>
                val m = AudioCodecs.decode(bytes)
                Row(m.sampleRate, m.channels, m.frames, m.bits,
                  m.format, m.ok)
              }
            case "decode" =>
              df = mapBinary(df, inIdx, out, metaType) { bytes =>
                val m = ImageCodecs.decode(bytes)
                Row(m.width, m.height, m.channels, m.format, m.ok)
              }
            case "resize" =>
              val (w, h) = (o.int("width").getOrElse(224),
                o.int("height").getOrElse(224))
              df = mapBinary(df, inIdx, out, BinaryType)(
                ImageCodecs.resize(_, w, h))
            case "frame_sample" =>
              val n = o.int("frames").getOrElse(4)
              // config knob, not data: fail fast instead of two
              // different per-codec degrade behaviors. The upper
              // bound mirrors maxGifFrames — the real path self-caps
              // at the container frame count, but the IMG-stub path
              // would otherwise allocate n elements unchecked
              require(n >= 1 && n <= maxGifFrames,
                s"multimodal ${cfg.name}: frame_sample frames must " +
                  s"be in [1, $maxGifFrames], got $n")
              df = mapBinary(df, inIdx, out, ArrayType(BinaryType))(
                ImageCodecs.frameSample(_, n))
            case "embed" if o.str("model").isDefined =>
              // route through the onnx transform's pluggable Session
              // seam: bytes → real ImageIO decode → pixel tensor →
              // session.run → array<float>, with the SAME per-
              // partition lifecycle + batching as OnnxTransform. A
              // real vision encoder becomes a jar drop-in (install
              // OnnxTransform.sessionFactory); `stub:linear` runs the
              // deterministic elementwise 2x+1 stand-in under the
              // oracle. Reference contract: transform/
              // ONNXTransform.java:590 (session-run batching).
              val modelPath = o.str("model").get
              val grid = o.int("grid").getOrElse(8)
              require(grid >= 1 && grid <= 64,
                s"multimodal ${cfg.name}: embed grid must be in " +
                  s"[1, 64], got $grid")
              val bufferSize = o.int("bufferSize").getOrElse(32)
              require(bufferSize >= 1,
                s"multimodal ${cfg.name}: embed bufferSize must be " +
                  s">= 1, got $bufferSize")
              df = embedViaSession(df, inIdx, out, modelPath, grid,
                bufferSize)
            case "embed" =>
              val dim = o.int("dim").getOrElse(64)
              df = mapBinary(df, inIdx, out, ArrayType(FloatType))(
                StubCodecs.embed(_, dim))
            case other =>
              throw new IllegalArgumentException(s"multimodal op: $other")
          }
      }
    }
    TransformCommon.finishRouted(df, cfg)
  }

  /** Fixture-size ceilings: past these, a "dimension" is corrupt
    * data, not a real request — 16k² pixels / 16M PCM frames (32 MB)
    * already dwarf any training fixture, and an unchecked value
    * would overflow the allocation (frames·2 wraps Int) or OOM. */
  private val maxPngDim = 16384
  private val maxWavFrames = 16 * 1024 * 1024
  private val maxGifFrames = 4096
  private val maxGifPixelFrames = 64L * 1024 * 1024 // w·h·frames

  /** Per-row generation size: None (→ null output, data-degrade) for
    * null, unparseable, non-positive, or out-of-range values — never
    * a throw, and never an intValue() truncation that would wrap an
    * out-of-long-range count into a plausible small one. */
  private def boundedInt(row: Row, idx: Int, max: Int): Option[Int] = {
    if (row.isNullAt(idx)) return None
    val asLong: Option[Long] = row.get(idx) match {
      case n: Number =>
        // non-integral numerics (width 4.9) must degrade to null,
        // not silently truncate via longValue — a double-typed dims
        // column would otherwise yield smaller images than requested
        // with no signal
        val l = n.longValue()
        if (n.doubleValue() == l.toDouble) Some(l) else None
      case other =>
        try Some(other.toString.trim.toLong)
        catch { case _: NumberFormatException => None }
    }
    asLong.filter(v => v > 0L && v <= max).map(_.toInt)
  }

  /** Shared seed coercion for the generate ops (one convention: the
    * column's long value, or the string's hashCode; absent → 0). */
  private def seedOf(row: Row, sIdx: Option[Int]): Long = sIdx match {
    case Some(i) if !row.isNullAt(i) =>
      row.get(i) match {
        case n: Number => n.longValue()
        case other => other.toString.hashCode.toLong
      }
    case _ => 0L
  }

  /** `embed` with a model: decode each row's image to a grid×grid
    * normalized-RGB tensor and run batches through an
    * [[OnnxTransform.Session]] — one session per partition (opened
    * lazily, closed on task completion), rows grouped into
    * `bufferSize` batches, undecodable rows skipped around the
    * session (null embedding) rather than fed to it. Input tensor
    * name "x", output tensor "out" (the stub session's contract;
    * mapping knobs belong to the full `onnx` transform — this is the
    * one-tensor vision-embed fast path). */
  private def embedViaSession(df: DataFrame, inIdx: Int, out: String,
      modelPath: String, grid: Int, bufferSize: Int): DataFrame = {
    val outSchema = df.schema.add(out, ArrayType(FloatType))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val factory = OnnxTransform.sessionFactory
    df.mapPartitions { it =>
      var session: OnnxTransform.Session = null
      def sess(): OnnxTransform.Session = {
        if (session == null) {
          session = factory(modelPath)
          val tc = org.apache.spark.TaskContext.get()
          if (tc != null)
            tc.addTaskCompletionListener[Unit](_ => session.close())
        }
        session
      }
      it.grouped(bufferSize).flatMap { batch =>
        val tensors: Seq[Array[Double]] = batch.map { row =>
          row.get(inIdx) match {
            case b: Array[Byte] => ImageCodecs.pixelTensor(b, grid)
            case _ => null
          }
        }
        // only decodable rows reach the session; nulls scatter back
        val live = tensors.zipWithIndex.filter(_._1 != null)
        val outByPos: Map[Int, Array[Float]] =
          if (live.isEmpty) Map.empty
          else {
            val ran = sess().run(
              Map("x" -> live.map(_._1: Any).toIndexedSeq), live.size)
            // loud-failure stance: a session whose output tensor is
            // named anything else (a dropped-in real encoder emits
            // "output"/"embedding"/...) or that returns fewer
            // vectors than inputs must fail with the fix named —
            // NOT emit all-null embeddings indistinguishable from
            // undecodable bytes
            val vecs = ran.getOrElse("out",
              throw new IllegalStateException(
                "embed session returned no 'out' tensor (got: " +
                  ran.keys.mkString(", ") + ") — the embed fast " +
                  "path expects the output tensor named 'out'; " +
                  "adapt the Session installed via OnnxTransform" +
                  ".sessionFactory, or use the full onnx transform " +
                  "with an explicit outputs mapping"))
            require(vecs.size == live.size,
              s"embed session returned ${vecs.size} vectors for " +
                s"${live.size} inputs — the Session must emit one " +
                "output per row")
            live.map(_._2).zip(vecs.map(toFloats)).toMap
          }
        batch.iterator.zipWithIndex.map { case (row, i) =>
          Row.fromSeq(row.toSeq :+ outByPos.get(i).orNull)
        }
      }
    }(enc)
  }

  /** Session outputs arrive as whatever the runtime hands back
    * (double/float arrays or seqs) — normalize to array<float>. */
  private def toFloats(v: Any): Array[Float] = v match {
    case null => null
    case a: Array[Float] => a
    case a: Array[Double] => a.map(_.toFloat)
    case s: Seq[_] => s.map {
      case n: Number => n.floatValue()
      case x => x.toString.toFloat
    }.toArray
    case other =>
      throw new IllegalStateException(
        s"embed session returned a non-vector output: " +
          s"${other.getClass.getName}")
  }

  /** mapPartitions with schema evolution: append `out` of type `dt`
    * computed from the whole row. Codec state initializes once per
    * partition (the perf point of mapPartitions over a per-row UDF). */
  private def mapRows(df: DataFrame, out: String, dt: DataType)(
      f: Row => Any): DataFrame = {
    val outSchema = df.schema.add(out, dt)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    df.mapPartitions { it =>
      it.map(row => Row.fromSeq(row.toSeq :+ f(row)))
    }(enc)
  }

  /** [[mapRows]] specialized to one binary input column. */
  private def mapBinary(df: DataFrame, inIdx: Int, out: String,
      dt: DataType)(f: Array[Byte] => Any): DataFrame =
    mapRows(df, out, dt) { row =>
      val bytes = row.get(inIdx) match {
        case b: Array[Byte] => b
        case null => null
        case other => other.toString.getBytes
      }
      f(bytes)
    }
}
