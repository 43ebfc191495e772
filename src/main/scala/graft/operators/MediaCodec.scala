package graft.operators

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Real public-format media codecs for the multimodal column family:
  * PNG (IHDR chunk, CRC-verified), JPEG/JFIF (marker-segment walk to
  * SOFn), and WAV/RIFF (fmt + data chunk walk). This replaces the
  * synthetic "GRFT" container ([[Multimodal]], kept for the q29–q31
  * plumbing oracle) with parsers that work on any real file of these
  * formats — pure per-row byte parsing, zero external dependencies.
  *
  * The encoder side builds REAL format bytes deterministically from the
  * `documents` table (the testdata carries no binary column), so the
  * oracle can recompute every extracted field straight from
  * `doc_id`/`strlen(text)` — any drift between what the encoder writes
  * and what the parser reads breaks the hash match. A deterministic
  * slice of rows is corrupted (PNG: IHDR CRC flipped; JPEG: truncated
  * mid-segment; WAV: bad RIFF form type) to exercise the parser's real
  * failure paths — CRC mismatch, bounds, magic — and those rows are
  * DROPPED with a counted audit (`audit`), never silently lost.
  *
  * Scale notes (same contract as [[Multimodal]]): encode, parse, and
  * metadata extraction are narrow partition-local maps — binary payloads
  * never shuffle; only small typed metadata rows flow further. The audit
  * is one map-side-combined aggregate over a 4-row key space.
  *
  * Reference provenance: the reference pipeline has no media path at
  * all (dnstap2clickhouse is DNS-only); this is extension surface for
  * the training-data stack, per the brief.
  */
object MediaCodec {

  /** Upper bound on a decoded pixel buffer (filter bytes included).
    * A CRC-valid header claiming dimensions past this gets None, not an
    * allocation — see [[decodePngPixels]]. */
  val MaxDecodedPixelBytes: Long = 64L * 1024 * 1024

  final case class MediaRow(doc_id: Long, media: Array[Byte])

  /** Typed header metadata; image-only fields are None for audio and
    * vice versa. `bit_depth` is PNG bit depth / JPEG sample precision /
    * WAV bits-per-sample. */
  final case class MediaMeta(format: String, width: Option[Int],
                             height: Option[Int], bitDepth: Option[Int],
                             channels: Option[Int], sampleRate: Option[Int],
                             durationMs: Option[Long])

  final case class MediaMetaRow(doc_id: Long, format: String,
                                width: Option[Int], height: Option[Int],
                                bit_depth: Option[Int], channels: Option[Int],
                                sample_rate: Option[Int],
                                duration_ms: Option[Long], n_bytes: Long)

  // =====================================================================
  // Encoders — deterministic real-format bytes from (doc_id, text).
  // Every formula below is mirrored in the q102/q103 oracle SQL.
  // =====================================================================

  /** doc_id % 3 selects the format; doc_id % 37 == 0 marks the row for
    * deterministic corruption. */
  def encode(docId: Long, text: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val raw = (docId % 3) match {
      case 0 => encodePng(docId, payload)
      case 1 => encodeJpeg(docId, payload)
      case _ => encodeWav(docId, payload)
    }
    if (docId % 37 == 0) corrupt(docId, raw) else raw
  }

  def pngWidth(docId: Long): Int = (64 + docId % 1024).toInt
  def pngHeight(docId: Long): Int = (64 + (docId * 7) % 768).toInt
  def pngBitDepth(docId: Long): Int = (8 + 8 * (docId % 2)).toInt
  def jpegWidth(docId: Long): Int = (64 + (docId * 5) % 1024).toInt
  def jpegHeight(docId: Long): Int = (64 + (docId * 3) % 1024).toInt
  def wavChannels(docId: Long): Int = (1 + docId % 2).toInt
  def wavSampleRate(docId: Long): Int = 8000 << ((docId / 3) % 3).toInt

  private val PngSignature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** One PNG chunk: length, type, data, CRC32 over type+data (the real
    * PNG CRC convention — RFC 2083 §3.4). */
  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val typ = chunkType.getBytes(US_ASCII)
    val buf = ByteBuffer.allocate(12 + data.length)
    buf.putInt(data.length).put(typ).put(data)
    val crc = new CRC32()
    crc.update(typ)
    crc.update(data)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** Signature + IHDR(13) + IDAT(payload) + IEND. Total bytes:
    * 8 + 25 + (12 + len) + 12 = 57 + len. (The IDAT payload is opaque —
    * a header parser never inflates it.) Color type 2 = truecolor. */
  def encodePng(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val ihdr = ByteBuffer.allocate(13)
      .putInt(pngWidth(docId)).putInt(pngHeight(docId))
      .put(pngBitDepth(docId).toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    PngSignature ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", payload) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** SOI + APP0/JFIF(18) + COM(4 + min(len, 65000)) + SOF0(19) + EOI,
    * then any COM overflow rides after EOI (real decoders ignore
    * trailing bytes). Total bytes: 45 + len, regardless of the split.
    * SOF0 data: precision, height, width, 3 components (id, sampling,
    * quant table) → segment length 17. */
  def encodeJpeg(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val comLen = math.min(payload.length, 65000)
    val buf = ByteBuffer.allocate(45 + payload.length)
    buf.put(0xFF.toByte).put(0xD8.toByte) // SOI
    buf.put(0xFF.toByte).put(0xE0.toByte).putShort(16) // APP0, len 16
    buf.put("JFIF".getBytes(US_ASCII)).put(0.toByte)
    buf.put(1.toByte).put(1.toByte) // version 1.1
    buf.put(0.toByte).putShort(1).putShort(1) // aspect-ratio units, 1x1
    buf.put(0.toByte).put(0.toByte) // no thumbnail
    buf.put(0xFF.toByte).put(0xFE.toByte).putShort((comLen + 2).toShort) // COM
    buf.put(payload, 0, comLen)
    buf.put(0xFF.toByte).put(0xC0.toByte).putShort(17) // SOF0, len 17
    buf.put(8.toByte) // precision
    buf.putShort(jpegHeight(docId).toShort).putShort(jpegWidth(docId).toShort)
    buf.put(3.toByte) // components
    buf.put(1.toByte).put(0x22.toByte).put(0.toByte) // Y  2x2
    buf.put(2.toByte).put(0x11.toByte).put(1.toByte) // Cb 1x1
    buf.put(3.toByte).put(0x11.toByte).put(1.toByte) // Cr 1x1
    buf.put(0xFF.toByte).put(0xD9.toByte) // EOI
    if (comLen < payload.length) buf.put(payload, comLen, payload.length - comLen)
    buf.array()
  }

  /** RIFF/WAVE with a 16-byte PCM fmt chunk and a data chunk holding the
    * payload (odd sizes get the RIFF pad byte). Total bytes:
    * 12 + 24 + 8 + len + (len % 2) = 44 + len + len % 2. */
  def encodeWav(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val ch = wavChannels(docId)
    val rate = wavSampleRate(docId)
    val blockAlign = ch * 2 // 16-bit samples
    val pad = payload.length % 2
    val buf = ByteBuffer.allocate(44 + payload.length + pad)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII))
    buf.putInt(36 + payload.length + pad)
    buf.put("WAVE".getBytes(US_ASCII))
    buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
    buf.putShort(1.toShort).putShort(ch.toShort) // PCM, channels
    buf.putInt(rate).putInt(rate * blockAlign)
    buf.putShort(blockAlign.toShort).putShort(16.toShort)
    buf.put("data".getBytes(US_ASCII)).putInt(payload.length)
    buf.put(payload)
    if (pad == 1) buf.put(0.toByte)
    buf.array()
  }

  /** Format-specific deterministic corruption, chosen to hit DISTINCT
    * parser failure paths: PNG keeps a valid signature but flips an IHDR
    * CRC byte (CRC verification must catch it); JPEG truncates inside
    * the APP0 segment (bounds checks must catch it); WAV breaks the
    * RIFF form type (magic check must catch it). */
  def corrupt(docId: Long, raw: Array[Byte]): Array[Byte] = (docId % 3) match {
    case 0 => corruptPng(raw)
    case 1 => corruptJpeg(raw)
    case _ => corruptWav(raw)
  }

  private def corruptPng(raw: Array[Byte]): Array[Byte] = {
    val out = raw.clone()
    out(29) = (out(29) ^ 0xFF).toByte // first byte of the IHDR CRC
    out
  }

  private def corruptJpeg(raw: Array[Byte]): Array[Byte] = raw.take(10)

  private def corruptWav(raw: Array[Byte]): Array[Byte] = {
    val out = raw.clone()
    Array[Byte]('E', 'V', 'A', 'W').copyToArray(out, 8)
    out
  }

  // =====================================================================
  // Extended 5-format encoder family (q117/q118): PNG/JPEG/WAV plus BMP
  // and GIF, so EVERY parser in the sniffing chain has an end-to-end
  // oracle row. Same discipline as `encode`: every field and the exact
  // container byte count derive from (doc_id, strlen(text)) alone, so
  // DuckDB recomputes them without touching a byte.
  // =====================================================================

  def bmpWidth(docId: Long): Int = (16 + docId % 512).toInt
  def bmpHeight(docId: Long): Int = (16 + (docId * 3) % 512).toInt
  /** 8/24/32 bpp by doc_id — one row class per supported channel count. */
  def bmpBpp(docId: Long): Int = (docId % 3) match {
    case 0 => 8; case 1 => 24; case _ => 32
  }
  def gifWidth(docId: Long): Int = (1 + docId % 640).toInt
  def gifHeight(docId: Long): Int = (1 + (docId * 11) % 480).toInt
  def gifColourRes(docId: Long): Int = (docId % 8).toInt + 1

  /** "BM" file header (14) + BITMAPINFOHEADER (40) + payload as opaque
    * pixel data. Total bytes: 54 + len. Every 7th doc stores a NEGATIVE
    * height (the real-world top-down row order), exercising the
    * magnitude branch of [[parseBmp]] under the same oracle. */
  def encodeBmp(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(54 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + payload.length)
    buf.putShort(0.toShort).putShort(0.toShort) // reserved
    buf.putInt(54) // pixel-data offset
    buf.putInt(40) // BITMAPINFOHEADER
    val h = bmpHeight(docId)
    buf.putInt(bmpWidth(docId))
    buf.putInt(if (docId % 7 == 0) -h else h)
    buf.putShort(1.toShort) // planes
    buf.putShort(bmpBpp(docId).toShort)
    buf.putInt(0) // BI_RGB
    buf.putInt(payload.length)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(0).putInt(0) // palette sizes
    buf.put(payload)
    buf.array()
  }

  /** "GIF89a" + logical screen descriptor (7) + payload + 0x3B trailer.
    * Total bytes: 14 + len. Colour-resolution bits 4-6 of the packed
    * byte carry (doc_id % 8), reported +1 per the GIF89a spec. */
  def encodeGif(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(14 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes(US_ASCII))
    buf.putShort(gifWidth(docId).toShort)
    buf.putShort(gifHeight(docId).toShort)
    buf.put(((docId % 8).toInt << 4).toByte) // no global colour table
    buf.put(0.toByte).put(0.toByte) // background index, aspect ratio
    buf.put(payload)
    buf.put(0x3B.toByte)
    buf.array()
  }

  /** doc_id % 5 selects the format; doc_id % 37 == 0 corrupts, each
    * format through a DISTINCT parser failure path (PNG CRC flip, JPEG
    * truncation, WAV form type, BMP planes != 1, GIF signature). */
  def encodeExt(docId: Long, text: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val raw = (docId % 5) match {
      case 0 => encodePng(docId, payload)
      case 1 => encodeJpeg(docId, payload)
      case 2 => encodeWav(docId, payload)
      case 3 => encodeBmp(docId, payload)
      case _ => encodeGif(docId, payload)
    }
    if (docId % 37 == 0) corruptExt(docId, raw) else raw
  }

  def corruptExt(docId: Long, raw: Array[Byte]): Array[Byte] =
    (docId % 5) match {
      case 0 => corruptPng(raw)
      case 1 => corruptJpeg(raw)
      case 2 => corruptWav(raw)
      case 3 =>
        val out = raw.clone()
        out(26) = 2 // planes = 2 (little-endian low byte); must be 1
        out
      case _ =>
        val out = raw.clone()
        out(4) = '0' // "GIF80a" — neither 87a nor 89a
        out
    }

  // =====================================================================
  // MP4 / ISO-BMFF (r12): real box grammar — length-prefixed 4CC boxes,
  // ftyp brand, moov{mvhd,trak{tkhd}} walk, mdat payload. Every field
  // and byte count derives from (doc_id, strlen(text)) alone, the
  // q102/q117 oracle discipline extended to the video container.
  // =====================================================================

  def mp4Tracks(docId: Long): Int = (1 + docId % 3).toInt
  def mp4Width(docId: Long): Int = (160 + docId % 1280).toInt
  def mp4Height(docId: Long): Int = (120 + (docId * 7) % 720).toInt

  /** Minimal REAL ISO-BMFF file: ftyp(24) "isom", moov(8) holding
    * mvhd(108, timescale 1000, duration = payload bytes) and
    * `mp4Tracks` trak(100) boxes each a tkhd(92) with 16.16
    * fixed-point dims, then mdat(8 + payload). Total bytes:
    * 24 + 116 + tracks·100 + 8 + len. Any spec-conforming box walker
    * reads this file. */
  def encodeMp4(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val n = mp4Tracks(docId)
    val moovSize = 8 + 108 + n * 100
    val buf = ByteBuffer.allocate(24 + moovSize + 8 + payload.length)
      .order(ByteOrder.BIG_ENDIAN)
    // ftyp
    buf.putInt(24).put("ftyp".getBytes(US_ASCII))
    buf.put("isom".getBytes(US_ASCII)).putInt(0x200)
    buf.put("isom".getBytes(US_ASCII)).put("mp42".getBytes(US_ASCII))
    // moov > mvhd
    buf.putInt(moovSize).put("moov".getBytes(US_ASCII))
    buf.putInt(108).put("mvhd".getBytes(US_ASCII))
    buf.putInt(0) // version 0 + flags
    buf.putInt(0).putInt(0) // creation, modification
    buf.putInt(1000) // timescale: 1 unit = 1 ms
    buf.putInt(payload.length) // duration
    buf.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
    buf.put(new Array[Byte](10)) // reserved
    buf.putInt(0x00010000).putInt(0).putInt(0) // identity matrix
    buf.putInt(0).putInt(0x00010000).putInt(0)
    buf.putInt(0).putInt(0).putInt(0x40000000)
    buf.put(new Array[Byte](24)) // pre_defined
    buf.putInt(n + 1) // next_track_ID
    // moov > trak > tkhd (one per track)
    var t = 1
    while (t <= n) {
      buf.putInt(100).put("trak".getBytes(US_ASCII))
      buf.putInt(92).put("tkhd".getBytes(US_ASCII))
      buf.putInt(7) // version 0, flags: enabled | in-movie | in-preview
      buf.putInt(0).putInt(0) // creation, modification
      buf.putInt(t) // track_ID
      buf.putInt(0) // reserved
      buf.putInt(payload.length) // duration
      buf.put(new Array[Byte](8)) // reserved
      buf.putShort(0.toShort).putShort(0.toShort) // layer, alternate_group
      buf.putShort(0.toShort).putShort(0.toShort) // volume, reserved
      buf.putInt(0x00010000).putInt(0).putInt(0) // identity matrix
      buf.putInt(0).putInt(0x00010000).putInt(0)
      buf.putInt(0).putInt(0).putInt(0x40000000)
      buf.putInt(mp4Width(docId) << 16) // 16.16 fixed point
      buf.putInt(mp4Height(docId) << 16)
      t += 1
    }
    // mdat
    buf.putInt(8 + payload.length).put("mdat".getBytes(US_ASCII))
    buf.put(payload)
    buf.array()
  }

  /** Corrupt slice for [[attachVideo]]: overrun the nested mvhd box
    * size so the child overflows its moov parent — exercises the box
    * walker's containment check (a DISTINCT failure path from every
    * other format's corruption). */
  def corruptMp4(raw: Array[Byte]): Array[Byte] = {
    val out = raw.clone()
    // mvhd size field lives at offset 32 (after ftyp 24 + moov header 8)
    val bb = ByteBuffer.wrap(out).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(32, Int.MaxValue)
    out
  }

  /** Box-level video metadata: brand, track count, the ftyp/moov/mdat
    * byte splits, duration, and the first track's integer dims. */
  final case class Mp4Meta(majorBrand: String, nTracks: Int,
                           ftypBytes: Long, moovBytes: Long, mdatBytes: Long,
                           durationMs: Long, width: Int, height: Int,
                           mdatOff: Long = -1L, mdatEnd: Long = -1L)

  /** ISO-BMFF box walk, fully bounds-checked, None on anything
    * malformed: the file must LEAD with ftyp (the sniff), every box
    * must carry size >= 8 (64-bit largesize accepted when it fits an
    * Int) and nest EXACTLY within its parent, and moov must hold an
    * mvhd plus at least one trak{tkhd}. */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Meta] = {
    if (bytes == null || bytes.length < 16) return None
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    def fourcc(off: Int): String =
      new String(bytes, off + 4, 4, US_ASCII)
    // returns (bodyStart, boxEnd) or null on malformed framing
    def frame(off: Int, limit: Int): (Int, Int) = {
      if (off + 8 > limit) return null
      val s32 = bb.getInt(off).toLong & 0xFFFFFFFFL
      if (s32 == 1) { // 64-bit largesize
        if (off + 16 > limit) return null
        val s64 = bb.getLong(off + 8)
        if (s64 < 16 || s64 > limit - off) return null
        (off + 16, off + s64.toInt)
      } else if (s32 == 0) (off + 8, limit) // box extends to end
      else if (s32 < 8 || s32 > limit - off) null
      else (off + 8, off + s32.toInt)
    }
    if (fourcc(0) != "ftyp") return None
    val ftypF = frame(0, bytes.length)
    if (ftypF == null || ftypF._1 + 4 > ftypF._2) return None
    val major = new String(bytes, ftypF._1, 4, US_ASCII)
    var off = ftypF._2
    val ftypBytes = ftypF._2.toLong
    var moovBytes = -1L
    var mdatBytes = -1L
    var mdatOff = -1L
    var mdatEnd = -1L
    var nTracks = 0
    var durationMs = -1L
    var width = -1
    var height = -1
    while (off < bytes.length) {
      val f = frame(off, bytes.length)
      if (f == null) return None
      val typ = fourcc(off)
      if (typ == "moov") {
        moovBytes = (f._2 - off).toLong
        var c = f._1
        while (c < f._2) {
          val cf = frame(c, f._2)
          if (cf == null) return None
          fourcc(c) match {
            case "mvhd" =>
              if (cf._1 + 20 > cf._2) return None
              val version = bytes(cf._1) & 0xFF
              if (version != 0) return None // our profile; v1 is 64-bit
              val timescale = bb.getInt(cf._1 + 12).toLong & 0xFFFFFFFFL
              val duration = bb.getInt(cf._1 + 16).toLong & 0xFFFFFFFFL
              if (timescale == 0) return None
              durationMs = duration * 1000L / timescale
            case "trak" =>
              nTracks += 1
              var t = cf._1
              while (t < cf._2) {
                val tf = frame(t, cf._2)
                if (tf == null) return None
                if (fourcc(t) == "tkhd" && width < 0) {
                  if (tf._1 + 84 > tf._2) return None
                  width = bb.getInt(tf._1 + 76) >>> 16
                  height = bb.getInt(tf._1 + 80) >>> 16
                }
                t = tf._2
              }
            case _ => ()
          }
          c = cf._2
        }
      } else if (typ == "mdat") {
        mdatBytes = (f._2 - off).toLong
        mdatOff = f._1.toLong
        mdatEnd = f._2.toLong
      }
      off = f._2
    }
    if (moovBytes < 0 || durationMs < 0 || nTracks == 0 || width < 0) None
    else Some(Mp4Meta(major, nTracks, ftypBytes, moovBytes,
      math.max(mdatBytes, 0L), durationMs, width, height, mdatOff, mdatEnd))
  }

  // =====================================================================
  // Parsers — real format grammars, fully bounds-checked, None (never
  // throw) on anything malformed. Format is sniffed by magic, so the
  // parser chain works on arbitrary binary columns, not just ours.
  // =====================================================================

  def parseHeader(bytes: Array[Byte]): Option[MediaMeta] =
    if (bytes == null) None
    else parsePng(bytes).orElse(parseJpeg(bytes)).orElse(parseWav(bytes))
      .orElse(parseBmp(bytes)).orElse(parseGif(bytes))
      .orElse(parseMp4(bytes).map(m => MediaMeta("mp4", Some(m.width),
        Some(m.height), None, None, None, Some(m.durationMs))))

  /** BMP: "BM" + BITMAPINFOHEADER (the 40-byte DIB header every modern
    * writer emits): little-endian width, height (negative = top-down —
    * report the magnitude), planes must be 1, bpp. Our encoder never
    * emits BMP; the parser exists so the sniffing chain covers the
    * formats a crawled binary column actually contains. */
  def parseBmp(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dibSize = buf.getInt(14)
    if (dibSize < 40) return None // BITMAPCOREHEADER et al. not supported
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val planes = buf.getShort(26) & 0xFFFF
    val bpp = buf.getShort(28) & 0xFFFF
    if (width <= 0 || height == 0 || planes != 1 || bpp <= 0) return None
    val channels = bpp match {
      case 8 => 1
      case 24 => 3
      case 32 => 4
      case _ => return None
    }
    Some(MediaMeta("bmp", Some(width), Some(math.abs(height)),
      Some(bpp / channels), Some(channels), None, None))
  }

  /** GIF: "GIF87a"/"GIF89a" + logical-screen little-endian u16 dims.
    * Palette-indexed → 1 channel, bit depth from the colour-resolution
    * field (packed byte bits 4-6, stored minus one). */
  def parseGif(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val width = (bytes(6) & 0xFF) | ((bytes(7) & 0xFF) << 8)
    val height = (bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)
    if (width <= 0 || height <= 0) return None
    val colourRes = ((bytes(10) & 0x70) >> 4) + 1
    Some(MediaMeta("gif", Some(width), Some(height), Some(colourRes),
      Some(1), None, None))
  }

  /** PNG: 8-byte signature, then the IHDR chunk (must be first, per
    * spec): length 13, big-endian width/height, bit depth, color type.
    * The chunk CRC is VERIFIED — a bit-flipped header does not parse.
    * Channels derive from color type (grayscale 1, truecolor 3,
    * palette 1, gray+alpha 2, truecolor+alpha 4). */
  def parsePng(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSignature(i)) return None; i += 1 }
    val buf = ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    val len = buf.getInt()
    if (len != 13) return None
    val typ = new Array[Byte](4)
    buf.get(typ)
    if (!java.util.Arrays.equals(typ, "IHDR".getBytes(US_ASCII))) return None
    val width = buf.getInt()
    val height = buf.getInt()
    val bitDepth = buf.get() & 0xFF
    val colorType = buf.get() & 0xFF
    buf.get(); buf.get(); buf.get() // compression, filter, interlace
    val storedCrc = buf.getInt()
    val crc = new CRC32()
    crc.update(bytes, 8 + 4, 4 + 13) // type + data
    if (crc.getValue.toInt != storedCrc) return None
    if (width <= 0 || height <= 0) return None
    val channels = colorType match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => return None
    }
    Some(MediaMeta("png", Some(width), Some(height), Some(bitDepth),
      Some(channels), None, None))
  }

  private def isJpegSof(marker: Int): Boolean =
    // SOF0–SOF15 minus DHT (C4), JPG (C8), DAC (CC)
    marker >= 0xC0 && marker <= 0xCF &&
      marker != 0xC4 && marker != 0xC8 && marker != 0xCC

  /** JPEG: SOI, then the standard marker-segment walk — skip fill bytes,
    * stand-alone markers (RSTn/TEM) have no length, everything else
    * carries a big-endian length that includes itself — until a SOFn
    * frame header yields precision, height, width, component count.
    * Stops without an answer at EOI, SOS (entropy data follows — our
    * headers precede it), or any bounds violation. */
  def parseJpeg(bytes: Array[Byte]): Option[MediaMeta] = {
    if (bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 1 < bytes.length) {
      if ((bytes(i) & 0xFF) != 0xFF) return None
      var j = i
      while (j + 1 < bytes.length && (bytes(j + 1) & 0xFF) == 0xFF) j += 1 // fill bytes
      val marker = if (j + 1 < bytes.length) bytes(j + 1) & 0xFF else return None
      if (marker == 0xD9 || marker == 0xDA) return None // EOI / SOS: no SOF seen
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        i = j + 2 // stand-alone marker, no length field
      } else {
        if (j + 3 >= bytes.length) return None
        val segLen = ((bytes(j + 2) & 0xFF) << 8) | (bytes(j + 3) & 0xFF)
        if (segLen < 2 || j + 2 + segLen > bytes.length) return None
        if (isJpegSof(marker)) {
          if (segLen < 8) return None
          val p = j + 4
          val precision = bytes(p) & 0xFF
          val height = ((bytes(p + 1) & 0xFF) << 8) | (bytes(p + 2) & 0xFF)
          val width = ((bytes(p + 3) & 0xFF) << 8) | (bytes(p + 4) & 0xFF)
          val nComp = bytes(p + 5) & 0xFF
          if (width <= 0 || height <= 0 || nComp <= 0) return None
          return Some(MediaMeta("jpeg", Some(width), Some(height),
            Some(precision), Some(nComp), None, None))
        }
        i = j + 2 + segLen
      }
    }
    None
  }

  /** WAV: RIFF/WAVE form, then a chunk walk (4-byte id, little-endian
    * size, odd sizes padded) that must find a PCM-shaped `fmt ` chunk
    * and a `data` chunk. Duration is floor(dataBytes * 1000 / byteRate)
    * — the real PCM duration formula. Chunk order is NOT assumed
    * (real encoders emit LIST/INFO chunks anywhere). */
  def parseWav(bytes: Array[Byte]): Option[MediaMeta] =
    parseWavChunks(bytes).map(_._1)

  /** Full walk: header metadata plus the data chunk's (offset, length) —
    * the handle [[wavPcmSamples]] decodes from. */
  private def parseWavChunks(bytes: Array[Byte]): Option[(MediaMeta, Int, Long)] = {
    if (bytes.length < 44) return None
    def ascii(off: Int) = new String(bytes, off, 4, US_ASCII)
    if (ascii(0) != "RIFF" || ascii(8) != "WAVE") return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var channels, sampleRate, byteRate, bits = -1
    var dataLen = -1L
    var dataOff = -1
    var i = 12L
    while (i + 8 <= bytes.length) {
      val id = ascii(i.toInt)
      val size = buf.getInt(i.toInt + 4).toLong & 0xFFFFFFFFL
      if (i + 8 + size > bytes.length) return None // truncated chunk body
      if (id == "fmt " && size >= 16) {
        channels = buf.getShort(i.toInt + 10) & 0xFFFF
        sampleRate = buf.getInt(i.toInt + 12)
        byteRate = buf.getInt(i.toInt + 16)
        bits = buf.getShort(i.toInt + 22) & 0xFFFF
      } else if (id == "data") {
        dataLen = size
        dataOff = i.toInt + 8
      }
      // RIFF pads odd chunk bodies; a final chunk may omit the pad at EOF
      i += 8 + size + (size % 2)
    }
    if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || dataLen < 0) None
    else Some((MediaMeta("wav", None, None, Some(bits), Some(channels),
      Some(sampleRate), Some(dataLen * 1000L / byteRate)), dataOff, dataLen))
  }

  /** REAL PCM sample decode: signed 16-bit little-endian samples out of
    * the data chunk (a trailing odd byte — not a whole sample — is
    * ignored, as players do). Only 16-bit PCM parses; anything else is
    * a decoder error → None. */
  def wavPcmSamples(bytes: Array[Byte]): Option[Array[Short]] =
    parseWavChunks(bytes).flatMap { case (meta, off, len) =>
      if (!meta.bitDepth.contains(16)) None
      else {
        val n = (len / 2).toInt
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = (((bytes(off + 2 * i) & 0xFF)) |
            ((bytes(off + 2 * i + 1) & 0xFF) << 8)).toShort
          i += 1
        }
        Some(out)
      }
    }

  // =====================================================================
  // PNG PIXEL path — a real decode, not just headers: IDAT is a genuine
  // zlib stream (JDK Deflater/Inflater), scanlines carry real filter
  // bytes, and the decoder validates CRCs, inflated length, and filter
  // type before any pixel is trusted.
  // =====================================================================

  def pngPixelWidth(docId: Long): Int = (4 + docId % 8).toInt
  def pngPixelHeight(docId: Long): Int = (3 + docId % 5).toInt

  /** Tiny REAL PNG image: 8-bit truecolor, dims from doc_id, pixel bytes
    * cycled from the text, scanlines filter-0, IDAT = zlib-deflated.
    * Any spec-conforming PNG decoder renders this file. Every 41st image
    * gets its zlib header byte flipped ((CMF·256+FLG) % 31 breaks), so
    * the corrupt slice exercises the INFLATE failure path — distinct
    * from q102's CRC-flip slice. */
  def encodePngImage(docId: Long, text: String): Array[Byte] =
    encodePngImageSized(docId, text, pngPixelWidth(docId), pngPixelHeight(docId))

  /** [[encodePngImage]] with caller-chosen dimensions — the fixed-size
    * thumbnail shape the perceptual-hash family consumes. */
  def encodePngImageSized(docId: Long, text: String, w: Int, h: Int): Array[Byte] =
    encodePngFromPayload(docId, text.getBytes(UTF_8), w, h)

  /** [[encodePngImageSized]] over raw payload bytes (cycled across the
    * pixel plane) — the byte-exact core both the text-window thumbnail
    * and the plain text image share. */
  def encodePngFromPayload(docId: Long, payload: Array[Byte], w: Int,
                           h: Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + w * 3))
    var j = 0
    var p = 0
    var row = 0
    while (row < h) {
      raw(j) = 0 // filter type 0 (None)
      j += 1
      var c = 0
      while (c < w * 3) {
        raw(j) = if (payload.isEmpty) 0 else payload(p % payload.length)
        j += 1; p += 1; c += 1
      }
      row += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte) // 8-bit, truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val out = PngSignature ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", zOut.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
    if (docId % 41 == 0) {
      // first IDAT data byte = zlib CMF: sig(8) + IHDR(25) + len+type(8)
      out(41) = (out(41) ^ 0xFF).toByte
    }
    out
  }

  /** REAL PNG pixel decode: IHDR via [[parsePng]] (CRC-verified), every
    * IDAT chunk CRC-verified and concatenated, zlib-inflated, inflated
    * length validated against h·(1 + w·3), filter-0 rows destructured.
    * Supports what it claims (8-bit truecolor, filter None) and returns
    * None — never garbage — for anything else: wrong bit depth, CRC
    * mismatch, truncated/corrupt zlib, short inflate, unknown filter. */
  def decodePngPixels(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val meta = parsePng(bytes) match {
      case Some(m) if m.bitDepth.contains(8) && m.channels.contains(3) => m
      case _ => return None
    }
    val (w, h) = (meta.width.get, meta.height.get)
    // collect IDAT payloads (a real file may split the stream)
    val zBytes = new java.io.ByteArrayOutputStream()
    var i = 8
    var sawEnd = false
    while (!sawEnd && i + 12 <= bytes.length) {
      val buf = ByteBuffer.wrap(bytes, i, bytes.length - i)
      val len = buf.getInt()
      if (len < 0 || i + 12L + len > bytes.length) return None
      val typ = new String(bytes, i + 4, 4, US_ASCII)
      if (typ == "IDAT") {
        val crc = new CRC32()
        crc.update(bytes, i + 4, 4 + len)
        if (crc.getValue.toInt != ByteBuffer.wrap(bytes, i + 8 + len, 4).getInt())
          return None
        zBytes.write(bytes, i + 8, len)
      } else if (typ == "IEND") sawEnd = true
      i += 12 + len
    }
    // Size math in LONG: w/h come from an attacker-controlled (if
    // CRC-valid) IHDR, and Int arithmetic on huge claimed dimensions
    // overflows to a negative allocation size (uncaught
    // NegativeArraySizeException) or commits gigabytes before any
    // inflate-size check. Cap the decoded image at 64 MiB — far above
    // any payload this engine ships, and a None (not a throw) beyond
    // it, keeping the documented never-throw contract.
    val expectedL = h.toLong * (1L + w.toLong * 3L)
    if (w <= 0 || h <= 0 || expectedL > MaxDecodedPixelBytes) return None
    val expected = expectedL.toInt
    val raw = new Array[Byte](expected)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(zBytes.toByteArray)
    // inflate() may legally return a partial block per call — loop until
    // end-of-stream or no progress (truncated/overlong streams reject)
    val ok =
      try {
        var total = 0
        var progress = true
        while (!inflater.finished() && progress && total < expected) {
          val got = inflater.inflate(raw, total, expected - total)
          progress = got > 0
          total += got
        }
        if (total == expected && !inflater.finished()) {
          // the end-of-stream marker may need one more call; any extra
          // OUTPUT here means the stream is longer than the header claims
          val probe = new Array[Byte](1)
          if (inflater.inflate(probe) > 0) progress = false
        }
        progress && total == expected && inflater.finished()
      } catch { case _: java.util.zip.DataFormatException => false }
      finally inflater.end()
    if (!ok) return None
    val px = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val off = row * (1 + w * 3)
      if (raw(off) != 0) return None // only filter None is encoded
      System.arraycopy(raw, off + 1, px, row * w * 3, w * 3)
      row += 1
    }
    Some((w, h, px))
  }

  // =====================================================================
  // DataFrame surface — narrow maps, payloads never shuffle.
  // =====================================================================

  /** documents(doc_id, text, …) → (doc_id, media BINARY) with real
    * PNG/JPEG/WAV bytes (1/37th deterministically corrupted). */
  def attachMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => MediaRow(id, encode(id, text)) })
  }

  /** documents → (doc_id, media) across ALL FIVE sniffable formats
    * (doc_id % 5; see [[encodeExt]]) — the q117/q118 surface. */
  def attachMediaExt(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => MediaRow(id, encodeExt(id, text)) })
  }

  /** Batch header decode: rows whose bytes fail to parse are DROPPED
    * (use [[audit]] to count them — decoder-error rows must never
    * silently vanish from a pipeline without a ledger entry). */
  def extractMetadata(media: Dataset[MediaRow]): Dataset[MediaMetaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      parseHeader(m.media).map { h =>
        MediaMetaRow(m.doc_id, h.format, h.width, h.height, h.bitDepth,
          h.channels, h.sampleRate, h.durationMs, m.media.length.toLong)
      }
    })
  }

  final case class PcmStatsRow(doc_id: Long, n_samples: Long, peak: Int,
                               sum_sq: Long, mean_abs: Long)
  final case class PixelStatsRow(doc_id: Long, width: Int, height: Int,
                                 n_pixels: Long, sum_rgb: Long, max_byte: Int)

  /** Signal statistics over DECODED samples — the feature-extraction
    * stage run on real audio bytes (non-WAV / corrupt rows drop; pair
    * with [[audit]] for the ledger). Integer-exact (peak, energy, floor
    * mean) so an external engine certifies the decoded samples
    * themselves. Narrow map — samples never leave their partition. */
  def pcmStats(media: Dataset[MediaRow]): Dataset[PcmStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      wavPcmSamples(m.media).map { s =>
        var sumSq = 0L
        var sumAbs = 0L
        var peak = 0
        var i = 0
        while (i < s.length) {
          val v = s(i).toInt
          val a = math.abs(v)
          sumSq += v.toLong * v
          sumAbs += a
          if (a > peak) peak = a
          i += 1
        }
        PcmStatsRow(m.doc_id, s.length.toLong, peak, sumSq,
          if (s.length == 0) 0L else sumAbs / s.length)
      }
    })
  }

  /** documents → tiny REAL PNG images (see [[encodePngImage]]). */
  def attachImages(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        MediaRow(id, encodePngImage(id, text)) })
  }

  /** documents → fixed-size REAL PNG thumbnails — the perceptual-hash
    * input shape (a real pipeline standardizes every image to one
    * thumbnail size before hashing, so dims don't leak into the
    * fingerprint). The 20×14 default maps exactly onto [[dHash63]]'s
    * 10×7 cell grid as 2×2-pixel boxes — every cell is a true area
    * mean with no degenerate clamping. Same corrupt slice as
    * [[attachImages]] (every 41st
    * zlib header flipped → decode drops, ledgered by [[audit]]'s
    * discipline). */
  def attachThumbnails(docs: DataFrame, w: Int = 20, h: Int = 14): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val window = ThumbWindowBytes
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val tb = text.getBytes(UTF_8)
        val n = w * h * 3
        val payload =
          if (tb.isEmpty) Array.emptyByteArray
          else Array.tabulate(n)(k => tb((k * window / n) % tb.length))
        MediaRow(id, encodePngFromPayload(id, payload, w, h)) })
  }

  /** Canonical text window (bytes) a thumbnail standardizes: pixel k of
    * the w×h canvas reads window position k·window/(w·h·3) — a fixed
    * divisor, so two documents agreeing on the window render identical
    * thumbnails REGARDLESS of their total lengths (no cycle-length
    * aliasing), exactly like resizing the same source image to the
    * canonical canvas. */
  val ThumbWindowBytes: Int = 192

  /** 63-bit difference hash (dHash) over a decoded truecolor image,
    * standardized by an integer BOX FILTER (area mean), not a
    * nearest-neighbour sample (r12): the image partitions into a
    * 7-row × 10-column cell grid — cell (i, j) spans
    * x ∈ [i·w/10, max(i·w/10 + 1, (i+1)·w/10)) and
    * y ∈ [j·h/7, max(j·h/7 + 1, (j+1)·h/7)) (floor division; a
    * degenerate range clamps to one pixel when the image is narrower
    * than the grid) — and each cell takes the FLOOR MEAN of its pixels'
    * integer grayscales g = (r+g+b)/3. One bit per horizontally
    * adjacent cell-mean rise mean(i+1, j) > mean(i, j): 7×9 = 63 bits,
    * deliberately one short of 64 so the hash stays strictly positive
    * in any engine's signed 64-bit integer (DuckDB rejects 1<<63).
    * Area means make the fingerprint robust to isolated pixel noise —
    * under the old sample grid ANY wobble of exactly the sampled pixel
    * flipped a bit; under the mean a single pixel moves a cell by at
    * most 255/cellArea. Integer-exact and deterministic: an external
    * engine recomputes it from the pixel formula (q119). */
  def dHash63(w: Int, h: Int, px: Array[Byte]): Long = {
    def cellMean(i: Int, j: Int): Int = {
      val xlo = i * w / 10
      val xhi = math.max(xlo + 1, (i + 1) * w / 10)
      val ylo = j * h / 7
      val yhi = math.max(ylo + 1, (j + 1) * h / 7)
      var sum = 0
      var y = ylo
      while (y < yhi) {
        var x = xlo
        while (x < xhi) {
          val b = 3 * (y * w + x)
          sum += ((px(b) & 0xFF) + (px(b + 1) & 0xFF) + (px(b + 2) & 0xFF)) / 3
          x += 1
        }
        y += 1
      }
      sum / ((yhi - ylo) * (xhi - xlo))
    }
    var hash = 0L
    var bit = 0
    var j = 0
    while (j < 7) {
      var g0 = cellMean(0, j)
      var i = 0
      while (i < 9) {
        val g1 = cellMean(i + 1, j)
        if (g1 > g0) hash |= 1L << bit
        g0 = g1
        bit += 1
        i += 1
      }
      j += 1
    }
    hash
  }

  final case class DHashRow(doc_id: Long, dhash: Long)

  /** Decode → perceptual hash, one narrow map: pixels are consumed
    * partition-locally and only the 8-byte fingerprint survives — the
    * image analogue of the shingle→xxhash64 step in text dedup.
    * Undecodable rows drop (pair with [[audit]]). */
  def dHashes(media: Dataset[MediaRow]): Dataset[DHashRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodePngPixels(m.media).map { case (w, h, px) =>
        DHashRow(m.doc_id, dHash63(w, h, px))
      }
    })
  }

  /** Pixel statistics over fully DECODED images (inflate + scanline
    * destructure); undecodable rows drop. Narrow map. */
  def pixelStats(media: Dataset[MediaRow]): Dataset[PixelStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodePngPixels(m.media).map { case (w, h, px) =>
        var sum = 0L
        var maxB = 0
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xFF
          sum += v
          if (v > maxB) maxB = v
          i += 1
        }
        PixelStatsRow(m.doc_id, w, h, w.toLong * h, sum, maxB)
      }
    })
  }

  /** documents → REAL WAV containers for every doc (the all-audio
    * analogue of [[attachImages]]); every 43rd row gets the RIFF form
    * type broken ([[corruptWav]]'s path), so the fingerprint family has
    * its own decode-drop slice, disjoint from the image one (41) and
    * the mixed one (37). */
  /** mdat payload slice via the same bounds-checked box walk as
    * [[parseMp4]] (the file must parse end-to-end — a malformed
    * container yields None, never a garbage slice). The payload
    * extent comes from the box walk itself ([[Mp4Meta.mdatOff]] /
    * [[Mp4Meta.mdatEnd]]), not reconstructed arithmetically, so
    * conforming files with non-canonical box order (mdat before
    * moov, interleaved free boxes, largesize headers) slice
    * correctly, and a file with no mdat yields None. */
  def mp4MdatPayload(bytes: Array[Byte]): Option[Array[Byte]] =
    parseMp4(bytes).flatMap { m =>
      if (m.mdatOff < 0 || m.mdatEnd < m.mdatOff) None
      else Some(java.util.Arrays.copyOfRange(bytes, m.mdatOff.toInt, m.mdatEnd.toInt))
    }

  def mp4FrameSize(docId: Long): Int = (64 + docId % 128).toInt

  final case class FrameRow(doc_id: Long, frame_idx: Int, off: Long,
                            n_bytes: Int, sum_bytes: Long)

  /** Container-level frame sampling: the mdat payload segments into
    * fixed [[mp4FrameSize]]-byte frames (the last one ragged) and every
    * `stride`-th frame emits byte-level stats — the real-container
    * analogue of the synthetic q31 frame sampler, and the shape a video
    * training pipeline's frame-subsample stage has (decode stays
    * partition-local; only sampled-frame STATS rows shuffle, never
    * frame bytes). Undecodable containers drop (pair with [[audit]]). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[FrameRow] = {
    require(stride >= 1, s"frame stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      mp4MdatPayload(m.media).toSeq.flatMap { payload =>
        val fs = mp4FrameSize(m.doc_id)
        val nFrames = (payload.length + fs - 1) / fs
        (0 until nFrames by stride).map { f =>
          val off = f * fs
          val end = math.min(off + fs, payload.length)
          var sum = 0L
          var i = off
          while (i < end) { sum += (payload(i) & 0xFF); i += 1 }
          FrameRow(m.doc_id, f, off.toLong, end - off, sum)
        }
      }
    })
  }

  final case class VideoFrameHashRow(doc_id: Long, frame_idx: Int, vhash: Long)

  /** Frame-sampled perceptual hashing — the video leg of the near-dup
    * family (image = q119 thumbnails, audio = q121 fingerprints): the
    * mdat payload located by the certified box walk segments into FIXED
    * `frameBytes`-byte frames (fixed, unlike [[mp4FrameSize]]'s per-doc
    * container framing: a fingerprint grid must align across videos,
    * the reason real systems hash at a fixed sampling cadence), every
    * `stride`-th frame stretches onto the [[attachThumbnails]] 20×14
    * canvas (pixel k reads frame position k·192/840 mod frame length —
    * the same fixed-divisor standardization) and hashes with
    * [[dHash63]]. Partition-local: frame BYTES never shuffle, only
    * (doc, frame, 8-byte hash) rows leave the map. Corrupt containers
    * (the %47 slice) drop exactly as in the other mdat consumers. */
  def videoFrameHashes(media: Dataset[MediaRow], frameBytes: Int = 48,
                       stride: Int = 2): Dataset[VideoFrameHashRow] = {
    require(frameBytes >= 1 && stride >= 1,
      s"frameBytes/stride must be positive, got $frameBytes/$stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      mp4MdatPayload(m.media).toSeq.flatMap { payload =>
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).map { f =>
          val off = f * frameBytes
          val flen = math.min(frameBytes, payload.length - off)
          val px = Array.tabulate(840)(k =>
            payload(off + (k * ThumbWindowBytes / 840) % flen))
          VideoFrameHashRow(m.doc_id, f, dHash63(20, 14, px))
        }
      }
    })
  }

  /** documents → REAL MP4 containers (payload = text bytes in mdat);
    * every 47th doc gets [[corruptMp4]]'s nested-size overrun — a slice
    * disjoint from the 37/41/43 families so multimodal joins keep full
    * coverage on the other modalities. */
  def attachVideo(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = encodeMp4(id, text.getBytes(UTF_8))
        MediaRow(id, if (id % 47 == 0) corruptMp4(raw) else raw) })
  }

  // =====================================================================
  // H.264 Annex-B elementary stream (ITU-T H.264 §B.1 byte-stream
  // format): NAL units delimited by 00 00 01 start codes (4-byte on the
  // first), one header byte (forbidden_zero_bit, nal_ref_idc,
  // nal_unit_type), and emulation-prevention-escaped RBSP bodies
  // (00 00 [00..03] → 00 00 03 xx on the wire). The deterministic
  // encoder derives every field from (doc_id, payload) alone — the
  // q102/q117/q125 oracle discipline at NAL level — and the SPS body
  // deliberately contains 00 00 01 so EVERY stream exercises the
  // escape/unescape path.
  // =====================================================================

  /** Slice count of a payload: one slice per 64-byte chunk (+1 ragged /
    * empty tail slice when len % 64 == 0 — keeps the closed form
    * 1 + len/64 the oracle recomputes). */
  def h264Slices(len: Long): Int = (1 + len / 64).toInt

  private def escapeRbsp(body: Array[Byte]): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var zeros = 0
    body.foreach { b =>
      if (zeros >= 2 && (b & 0xFF) <= 3) { out += 3.toByte; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.result()
  }

  /** Deterministic Annex-B stream: SPS(type 7) + PPS(type 8) +
    * [[h264Slices]] slices — IDR (type 5, ref_idc 3) on every 8th
    * slice index, non-IDR (type 1, ref_idc 2) otherwise, each slice
    * carrying one header byte plus its 64-byte payload chunk. Every
    * RBSP ends with the spec's stop byte (0x80, the
    * rbsp_stop_one_bit pattern) — the grammar's own guarantee that a
    * NAL body never ends in 0x00, which is what keeps start-code
    * boundaries unambiguous for ARBITRARY payload bytes. */
  def encodeAnnexB(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var first = true
    def nal(refIdc: Int, typ: Int, body: Array[Byte]): Unit = {
      if (first) { out ++= Array[Byte](0, 0, 0, 1); first = false }
      else out ++= Array[Byte](0, 0, 1)
      out += ((refIdc << 5) | typ).toByte
      out ++= escapeRbsp(body)
      out += 0x80.toByte // rbsp stop byte
    }
    nal(3, 7, Array(0x00, 0x00, 0x01, (mp4Width(docId) & 0xFF)).map(_.toByte))
    nal(3, 8, Array((mp4Height(docId) & 0xFF).toByte, 0x08.toByte))
    val n = h264Slices(payload.length.toLong)
    var s = 0
    while (s < n) {
      val lo = s * 64
      val hi = math.min(lo + 64, payload.length)
      val body = (s % 251).toByte +: java.util.Arrays.copyOfRange(payload, lo, hi)
      if (s % 8 == 0) nal(3, 5, body) else nal(2, 1, body)
      s += 1
    }
    out.result()
  }

  final case class NalInfo(refIdc: Int, nalType: Int, rbspBytes: Int)

  /** Strict Annex-B walk: the stream must LEAD with a start code, every
    * NAL must be non-empty with forbidden_zero_bit clear and a type in
    * [1, 23], and emulation-prevention bytes strip back out of the
    * body. None — never throw, never a partial result — on anything
    * malformed. `rbspBytes` counts the header byte + unescaped body. */
  def parseAnnexB(bytes: Array[Byte]): Option[Seq[NalInfo]] = {
    if (bytes == null || bytes.length < 4) return None
    def startCodeLen(i: Int): Int =
      if (i + 3 < bytes.length && bytes(i) == 0 && bytes(i + 1) == 0 &&
          bytes(i + 2) == 0 && bytes(i + 3) == 1) 4
      else if (i + 2 < bytes.length && bytes(i) == 0 && bytes(i + 1) == 0 &&
          bytes(i + 2) == 1) 3
      else 0
    if (startCodeLen(0) == 0) return None
    // NAL boundaries: positions of every start code
    val starts = Array.newBuilder[(Int, Int)] // (nalBodyStart, startCodeLen)
    var i = 0
    while (i < bytes.length) {
      val sc = startCodeLen(i)
      if (sc > 0) { starts += ((i + sc, sc)); i += sc }
      else i += 1
    }
    val bounds = starts.result()
    val out = Seq.newBuilder[NalInfo]
    var k = 0
    while (k < bounds.length) {
      val from = bounds(k)._1
      val until =
        if (k + 1 < bounds.length) bounds(k + 1)._1 - bounds(k + 1)._2
        else bytes.length
      if (until - from < 1) return None // empty NAL: truncated stream
      val hdr = bytes(from) & 0xFF
      if ((hdr & 0x80) != 0) return None // forbidden_zero_bit
      val typ = hdr & 0x1F
      if (typ < 1 || typ > 23) return None
      // unescape: a 03 after two zeros is an emulation-prevention byte
      var rbsp = 1
      var zeros = 0
      var j = from + 1
      while (j < until) {
        val b = bytes(j) & 0xFF
        if (zeros >= 2 && b == 3) zeros = 0 // EPB: not an RBSP byte
        else {
          rbsp += 1
          zeros = if (b == 0) zeros + 1 else 0
        }
        j += 1
      }
      out += NalInfo((hdr >> 5) & 3, typ, rbsp)
      k += 1
    }
    Some(out.result())
  }

  /** documents → REAL MP4 containers whose mdat is an H.264 Annex-B
    * elementary stream over the text bytes; every 53rd doc gets its
    * FIRST start code broken (container parses, stream does not) — the
    * NAL walk's own decode-drop slice, disjoint from the image (41),
    * audio (43), mixed (37) and container (47) ones. */
  def attachVideoH264(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val annex = encodeAnnexB(id, text.getBytes(UTF_8))
        if (id % 53 == 0) annex(3) = 2 // 00 00 00 01 -> 00 00 00 02
        MediaRow(id, encodeMp4(id, annex)) })
  }

  final case class NalStatsRow(doc_id: Long, n_nals: Long, n_idr: Long,
                               n_nonidr: Long, n_sps: Long, n_pps: Long,
                               rbsp_bytes: Long)

  /** NAL-unit statistics per doc: container box walk → mdat slice →
    * Annex-B walk, all partition-local (bytes never shuffle; only the
    * per-doc counter rows do). Docs whose stream fails the strict walk
    * drop (pair with [[nalAudit]]). */
  def nalStats(media: Dataset[MediaRow]): Dataset[NalStatsRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      mp4MdatPayload(m.media).flatMap(parseAnnexB).map { nals =>
        NalStatsRow(m.doc_id,
          nals.size.toLong,
          nals.count(_.nalType == 5).toLong,
          nals.count(_.nalType == 1).toLong,
          nals.count(_.nalType == 7).toLong,
          nals.count(_.nalType == 8).toLong,
          nals.iterator.map(_.rbspBytes.toLong).sum)
      }
    })
  }

  /** Crawl-audit ledger for the NAL walk: how many containers carried a
    * valid elementary stream vs a broken one, with total container
    * bytes per status — the q126 shape one level deeper. */
  def nalAudit(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val ok = mp4MdatPayload(m.media).flatMap(parseAnnexB).isDefined
      (if (ok) "h264" else "bad_stream", m.media.length.toLong)
    }).toDF("status", "len")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("n_bytes"))
  }

  final case class Mp4MetaRow(doc_id: Long, major_brand: String,
                              n_tracks: Int, ftyp_bytes: Long,
                              moov_bytes: Long, mdat_bytes: Long,
                              duration_ms: Long, width: Int, height: Int,
                              n_bytes: Long)

  /** Box-walk metadata over video rows; unparseable rows drop (pair
    * with [[audit]], which ledgers them as `corrupt`). Narrow map —
    * container bytes never shuffle. */
  def videoMetadata(media: Dataset[MediaRow]): Dataset[Mp4MetaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      parseMp4(m.media).map(x =>
        Mp4MetaRow(m.doc_id, x.majorBrand, x.nTracks, x.ftypBytes,
          x.moovBytes, x.mdatBytes, x.durationMs, x.width, x.height,
          m.media.length.toLong))
    })
  }

  def attachAudio(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = encodeWav(id, text.getBytes(UTF_8))
        MediaRow(id, if (id % 43 == 0) corruptWav(raw) else raw) })
  }

  /** 60-bit integer audio fingerprint over decoded PCM — the public
    * sign-of-difference idea (Haitsma & Kalker's Philips fingerprint):
    * the bit pattern records WHERE each signal feature rises between
    * adjacent time frames, which survives volume scaling and small
    * edits. The stream splits into 21 equal frames (floor-division
    * bounds, so any engine agrees); per frame three integer features —
    * total |amplitude| (energy), sign-boundary crossings (the integer
    * stand-in for dominant frequency), and peak |amplitude| — and one
    * bit per adjacent-frame comparison per feature: 20 × 3 = 60 bits,
    * inside the 63-bit layout [[graft.operators.Dedup.hammingPairs63]]
    * blocks on. Integer-exact end to end: no FFT, no floats, an
    * external engine recomputes every bit from the raw samples. */
  def audioFingerprint(samples: Array[Short]): Long = {
    val frames = 21
    val n = samples.length
    val e = new Array[Long](frames)
    val z = new Array[Long](frames)
    val p = new Array[Long](frames)
    var f = 0
    while (f < frames) {
      val lo = f * n / frames
      val hi = (f + 1) * n / frames
      var sumAbs = 0L
      var zc = 0L
      var peak = 0L
      var i = lo
      while (i < hi) {
        val v = samples(i).toInt
        val a = math.abs(v)
        sumAbs += a
        if (a > peak) peak = a
        if (i > lo && ((v >= 0) != (samples(i - 1) >= 0))) zc += 1
        i += 1
      }
      e(f) = sumAbs; z(f) = zc; p(f) = peak
      f += 1
    }
    var h = 0L
    var k = 0
    while (k < 20) {
      if (e(k + 1) > e(k)) h |= 1L << k
      if (z(k + 1) > z(k)) h |= 1L << (20 + k)
      if (p(k + 1) > p(k)) h |= 1L << (40 + k)
      k += 1
    }
    h
  }

  final case class AudioFpRow(doc_id: Long, fingerprint: Long)

  /** Decode → fingerprint in one narrow map: PCM samples are consumed
    * partition-locally and only the 8-byte fingerprint survives (the
    * [[dHashes]] shape for audio). Non-WAV / corrupt rows drop. */
  def audioFingerprints(media: Dataset[MediaRow]): Dataset[AudioFpRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      wavPcmSamples(m.media).map(s => AudioFpRow(m.doc_id, audioFingerprint(s)))
    })
  }

  /** Decode audit: per-format document and byte counts, with
    * unparseable rows under the `corrupt` status — the counted ledger
    * for every row `extractMetadata` drops. One tiny hash aggregate
    * (4-row key space) with map-side combine. */
  def audit(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      (parseHeader(m.media).map(_.format).getOrElse("corrupt"),
        m.media.length.toLong)
    }).toDF("status", "len")
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"), sum("len").as("n_bytes"))
  }

  // =====================================================================
  // AVI / RIFF container (Microsoft AVI 1.0, the RIFF sibling of the
  // ISO-BMFF walk): LITTLE-endian sizes, even-byte chunk padding that
  // is NOT counted in the chunk size — two byte disciplines the
  // big-endian MP4 walk never exercises. Layout emitted:
  //   RIFF('AVI ' LIST('hdrl' avih [LIST('strl' strh strf)]×streams)
  //               LIST('movi' '00dc'-chunks) idx1)
  // Every field derives from (doc_id, strlen(text)) alone — the
  // q102/q117/q125 deterministic-encoder oracle discipline.
  // =====================================================================

  def aviStreams(docId: Long): Int = (1 + docId % 2).toInt
  /** One video chunk per 64-byte payload slice (+1 ragged/empty tail —
    * the closed form 1 + len/64 the oracle recomputes). */
  def aviFrames(len: Long): Int = (1 + len / 64).toInt

  /** Minimal REAL AVI: any spec-conforming RIFF walker reads it. The
    * last movi chunk is the ragged payload tail, odd-length tails get
    * the RIFF pad byte (excluded from the chunk size), and idx1 holds
    * one AVIIF_KEYFRAME entry per chunk with true movi-relative
    * offsets. */
  def encodeAvi(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val streams = aviStreams(docId)
    val frames = aviFrames(payload.length.toLong)
    val lastLen = payload.length - 64 * (frames - 1)
    val lastPad = lastLen & 1
    val hdrlContent = 4 + 64 + 124 * streams
    val moviContent = 4 + (frames - 1) * 72 + 8 + lastLen + lastPad
    val idx1Size = 16 * frames
    val total = 12 + 8 + hdrlContent + 8 + moviContent + 8 + idx1Size
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = { buf.put(s.getBytes(US_ASCII)); () }
    fourcc("RIFF"); buf.putInt(total - 8); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlContent); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(33333).putInt(0).putInt(0).putInt(0x10) // µs/frame, maxBps, padGran, HASINDEX
    buf.putInt(frames).putInt(0).putInt(streams).putInt(0)
    buf.putInt(mp4Width(docId)).putInt(mp4Height(docId))
    buf.put(new Array[Byte](16)) // reserved
    var s = 0
    while (s < streams) {
      fourcc("LIST"); buf.putInt(116); fourcc("strl")
      fourcc("strh"); buf.putInt(56)
      fourcc("vids"); fourcc("DIB ")
      buf.putInt(0) // flags
      buf.putShort(0.toShort).putShort(0.toShort) // priority, language
      buf.putInt(0) // initial frames
      buf.putInt(1).putInt(30) // scale, rate: 30 fps
      buf.putInt(0).putInt(if (s == 0) frames else 0) // start, length
      buf.putInt(0).putInt(0).putInt(0) // suggBuf, quality, sampleSize
      buf.putShort(0.toShort).putShort(0.toShort) // rcFrame left, top
      buf.putShort(mp4Width(docId).toShort).putShort(mp4Height(docId).toShort)
      fourcc("strf"); buf.putInt(40)
      buf.putInt(40).putInt(mp4Width(docId)).putInt(mp4Height(docId))
      buf.putShort(1.toShort).putShort(24.toShort) // planes, bit count
      buf.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      s += 1
    }
    fourcc("LIST"); buf.putInt(moviContent); fourcc("movi")
    var f = 0
    var off = 0
    while (f < frames) {
      val l = if (f < frames - 1) 64 else lastLen
      fourcc("00dc"); buf.putInt(l)
      buf.put(payload, off, l); off += l
      if ((l & 1) == 1) buf.put(0.toByte)
      f += 1
    }
    fourcc("idx1"); buf.putInt(idx1Size)
    f = 0
    while (f < frames) {
      val l = if (f < frames - 1) 64 else lastLen
      fourcc("00dc"); buf.putInt(0x10) // AVIIF_KEYFRAME
      buf.putInt(4 + 72 * f).putInt(l) // movi-relative offset, size
      f += 1
    }
    buf.array()
  }

  /** Corrupt slice for [[attachAvi]]: overrun the avih chunk size so
    * it overflows its hdrl parent — the RIFF containment-check failure
    * path (the LE sibling of [[corruptMp4]]'s nested overrun). */
  def corruptAvi(raw: Array[Byte]): Array[Byte] = {
    val out = raw.clone()
    // avih size field: RIFF hdr 12 + LIST hdr 8 + 'hdrl' 4 + 'avih' 4
    ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(28, Int.MaxValue)
    out
  }

  final case class AviMeta(nStreams: Int, totalFrames: Long, width: Int,
                           height: Int, moviListBytes: Long,
                           nVideoChunks: Long, idxEntries: Long)

  /** Strict RIFF walk: every chunk must fit its parent, LIST headers
    * must be complete, pad bytes are skipped, the avih stream count
    * must match the strl census, and idx1 must be a whole number of
    * 16-byte entries. None on any violation — never throw. */
  def parseAvi(bytes: Array[Byte]): Option[AviMeta] = {
    def le32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
        ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, US_ASCII)
    if (tag(0) != "RIFF") return None
    val riffSize = le32(4)
    if (riffSize < 4 || 8 + riffSize > bytes.length) return None
    if (tag(8) != "AVI ") return None
    var nStreams = -1
    var totalFrames = -1L
    var width = -1
    var height = -1
    var strlSeen = 0
    var moviListBytes = -1L
    var nVideoChunks = 0L
    var idxEntries = -1L
    var pos = 12
    val end = 8 + riffSize.toInt
    while (pos < end) {
      if (pos + 8 > end) return None
      val t = tag(pos)
      val sz = le32(pos + 4)
      if (sz < 0 || pos + 8 + sz > end) return None
      if (t == "LIST") {
        if (sz < 4) return None
        val listType = tag(pos + 8)
        val lEnd = pos + 8 + sz.toInt
        var p = pos + 12
        if (listType == "hdrl") {
          while (p < lEnd) {
            if (p + 8 > lEnd) return None
            val ct = tag(p)
            val cs = le32(p + 4)
            if (cs < 0 || p + 8 + cs > lEnd) return None
            if (ct == "avih") {
              if (cs < 56) return None
              totalFrames = le32(p + 8 + 16)
              nStreams = le32(p + 8 + 24).toInt
              width = le32(p + 8 + 32).toInt
              height = le32(p + 8 + 36).toInt
            } else if (ct == "LIST" && tag(p + 8) == "strl") strlSeen += 1
            p += 8 + cs.toInt + (cs.toInt & 1)
          }
        } else if (listType == "movi") {
          moviListBytes = sz
          while (p < lEnd) {
            if (p + 8 > lEnd) return None
            val ct = tag(p)
            val cs = le32(p + 4)
            if (cs < 0 || p + 8 + cs > lEnd) return None
            if (ct.endsWith("dc") || ct.endsWith("db")) nVideoChunks += 1
            p += 8 + cs.toInt + (cs.toInt & 1)
          }
        }
      } else if (t == "idx1") {
        if (sz % 16 != 0) return None
        idxEntries = sz / 16
      }
      pos += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (nStreams < 0 || totalFrames < 0 || moviListBytes < 0 ||
      idxEntries < 0 || strlSeen != nStreams) None
    else Some(AviMeta(nStreams, totalFrames, width, height, moviListBytes,
      nVideoChunks, idxEntries))
  }

  /** documents → REAL AVI containers; every 59th doc gets
    * [[corruptAvi]]'s chunk-size overrun — a slice disjoint from the
    * 37/41/43/47/53 families so multimodal joins keep full coverage on
    * the other modalities. */
  def attachAvi(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = encodeAvi(id, text.getBytes(UTF_8))
        MediaRow(id, if (id % 59 == 0) corruptAvi(raw) else raw) })
  }

  final case class AviMetaRow(doc_id: Long, n_streams: Int,
                              total_frames: Long, width: Int, height: Int,
                              movi_bytes: Long, n_chunks: Long,
                              idx_entries: Long)

  /** RIFF-walk metadata over AVI rows; unparseable rows drop (pair
    * with [[aviAudit]]). Narrow map — container bytes never shuffle. */
  def aviMetadata(media: Dataset[MediaRow]): Dataset[AviMetaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      parseAvi(m.media).map(x =>
        AviMetaRow(m.doc_id, x.nStreams, x.totalFrames, x.width, x.height,
          x.moviListBytes, x.nVideoChunks, x.idxEntries))
    })
  }

  /** Crawl-audit ledger for the RIFF walk: parsed vs broken containers
    * with total bytes per status — the q126 shape for AVI. */
  def aviAudit(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      (if (parseAvi(m.media).isDefined) "avi" else "bad_riff",
        m.media.length.toLong)
    }).toDF("status", "len")
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("n_bytes"))
  }
}
