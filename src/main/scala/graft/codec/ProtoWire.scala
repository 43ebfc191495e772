package graft.codec

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format reader/writer (proto2/proto3 wire level:
  * varint, fixed32/64, length-delimited). Hand-rolled because the build is
  * dependency-free by design — only the handful of field shapes the dnstap
  * schema uses are needed. Malformed input throws; callers catch at the
  * frame boundary and drop the record (the reference logs+drops too,
  * /root/reference/src/dnstap/dnstap.go:277-280).
  */
final class ProtoReader(buf: Array[Byte], start: Int, end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)
  private var pos = start

  def hasNext: Boolean = pos < end

  def readVarint(): Long = {
    var shift = 0
    var v = 0L
    while (shift < 64) {
      if (pos >= end) throw new IllegalArgumentException("varint overruns buffer")
      val b = buf(pos); pos += 1
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    throw new IllegalArgumentException("varint too long")
  }

  /** @return (fieldNumber, wireType) */
  def readTag(): (Int, Int) = {
    val t = readVarint().toInt
    (t >>> 3, t & 7)
  }

  def readFixed32(): Int = {
    if (pos + 4 > end) throw new IllegalArgumentException("fixed32 overruns buffer")
    val v = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4
    v
  }

  def readFixed64(): Long = {
    val lo = readFixed32() & 0xffffffffL
    val hi = readFixed32() & 0xffffffffL
    lo | (hi << 32)
  }

  def readBytes(): Array[Byte] = {
    val len = readVarint().toInt
    if (len < 0 || pos + len > end) throw new IllegalArgumentException("bytes overrun buffer")
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + len)
    pos += len
    out
  }

  def skip(wireType: Int): Unit = wireType match {
    case 0 => readVarint()
    case 1 => readFixed64()
    case 2 => readBytes()
    case 5 => readFixed32()
    case w => throw new IllegalArgumentException(s"unsupported wire type $w")
  }
}

/** Writer counterpart, used to build fixtures and (later) encode frames. */
final class ProtoWriter {
  private val out = new ByteArrayOutputStream()

  def writeVarintRaw(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def tag(field: Int, wire: Int): Unit = writeVarintRaw((field.toLong << 3) | wire)

  def varint(field: Int, v: Long): ProtoWriter = { tag(field, 0); writeVarintRaw(v); this }

  def fixed32(field: Int, v: Int): ProtoWriter = {
    tag(field, 5)
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    this
  }

  def bytes(field: Int, b: Array[Byte]): ProtoWriter = {
    tag(field, 2); writeVarintRaw(b.length.toLong); out.write(b, 0, b.length); this
  }

  def string(field: Int, s: String): ProtoWriter =
    bytes(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def message(field: Int, m: ProtoWriter): ProtoWriter = bytes(field, m.toBytes)

  def toBytes: Array[Byte] = out.toByteArray
}
