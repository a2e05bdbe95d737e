package graft.ops

import java.io.ByteArrayOutputStream

/** Protobuf wire-format primitives (encoding spec at
  * protobuf.dev/programming-guides/encoding — varint, zigzag,
  * fixed32/64, length-delimited). Pure-JVM implementation: the image
  * bundles only shaded protobuf runtimes (hadoop-thirdparty, orc),
  * which are internal relocations, not public API — so the engine
  * carries its own ~100-line reader/writer instead of linking one.
  *
  * Groups (wire types 3/4, removed in proto3) are skipped
  * structurally on read and never written. */
object ProtoWire {

  final val WtVarint = 0
  final val WtFixed64 = 1
  final val WtLen = 2
  final val WtStartGroup = 3
  final val WtEndGroup = 4
  final val WtFixed32 = 5

  /** Sequential reader over `buf[pos, end)`. Not thread-safe. */
  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)

    def hasMore: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException(
          "protobuf: truncated varint")
        val b = buf(pos); pos += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("protobuf: varint > 10 bytes")
    }

    /** Returns (fieldNumber, wireType). */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    def readFixed32(): Int = {
      require(pos + 4 <= end, "protobuf: truncated fixed32")
      val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
        ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }

    def readFixed64(): Long = {
      require(pos + 8 <= end, "protobuf: truncated fixed64")
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xffL); i -= 1 }
      pos += 8
      v
    }

    /** Length-delimited payload as a sub-range (zero copy). */
    def readLen(): (Int, Int) = {
      val n = readVarint().toInt
      require(n >= 0 && pos + n <= end, "protobuf: truncated bytes")
      val start = pos
      pos += n
      (start, start + n)
    }

    def readBytes(): Array[Byte] = {
      val (s, e) = readLen()
      java.util.Arrays.copyOfRange(buf, s, e)
    }

    def readString(): String = {
      val (s, e) = readLen()
      new String(buf, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
    }

    def skip(wireType: Int): Unit = wireType match {
      case WtVarint => readVarint()
      case WtFixed64 =>
        require(pos + 8 <= end, "protobuf: truncated fixed64")
        pos += 8
      case WtLen => readLen()
      case WtFixed32 =>
        require(pos + 4 <= end, "protobuf: truncated fixed32")
        pos += 4
      case WtStartGroup => // structural skip until matching end-group
        var depth = 1
        while (depth > 0 && hasMore) {
          val (_, wt) = readTag()
          wt match {
            case WtStartGroup => depth += 1
            case WtEndGroup => depth -= 1
            case other => skip(other)
          }
        }
        // a message that ends mid-group is truncated, not valid —
        // without this a cut-off record would decode as good instead
        // of routing to .failures
        require(depth == 0, "protobuf: truncated group")
      case WtEndGroup => ()
      case other =>
        throw new IllegalArgumentException(s"protobuf: wire type $other")
    }
  }

  def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1)
  def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Append-only writer. */
  final class Writer {
    private val out = new ByteArrayOutputStream()

    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt)
        v >>>= 7
      }
      out.write(v.toInt)
    }

    def writeTag(field: Int, wireType: Int): Unit =
      writeVarint((field.toLong << 3) | wireType)

    def writeFixed32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }

    def writeFixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }

    def writeBytes(b: Array[Byte]): Unit = {
      writeVarint(b.length.toLong)
      out.write(b, 0, b.length)
    }

    def writeString(s: String): Unit =
      writeBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    def toByteArray: Array[Byte] = out.toByteArray
  }
}
