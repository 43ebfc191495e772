package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodec._

/** Fuzz + foreign-format coverage for the media parsers: a parser fed
  * arbitrary bytes must return None or a value — NEVER throw — and the
  * encoder→decoder round trips must hold for arbitrary payloads
  * (including non-ASCII text and raw binary), not just the testdata's
  * ASCII. Deterministic seeds, the InvariantsSpec convention. */
class MediaCodecFuzzSpec extends AnyFunSuite {

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(1042L + i)))
    }

  private val rawBytes: Gen[Array[Byte]] =
    Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  /** Random bytes behind each real magic — exercises the deep parsing
    * paths, not just the signature rejects. */
  private val magicPrefixed: Gen[Array[Byte]] = for {
    magic <- Gen.oneOf(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0x0D.toByte,
        0x0A.toByte, 0x1A.toByte, 0x0A.toByte),
      Array(0xFF.toByte, 0xD8.toByte),
      "RIFF".getBytes(US_ASCII), "RIFFxxxxWAVE".getBytes(US_ASCII),
      "BM".getBytes(US_ASCII), "GIF89a".getBytes(US_ASCII),
      Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes(US_ASCII))
    tail <- rawBytes
  } yield magic ++ tail

  test("parsers never throw on arbitrary or magic-prefixed bytes") {
    forAllSeeded(rawBytes, 300) { b =>
      parseHeader(b); wavPcmSamples(b); decodePngPixels(b); parseMp4(b); ()
    }
    forAllSeeded(magicPrefixed, 300) { b =>
      parseHeader(b); wavPcmSamples(b); decodePngPixels(b); parseMp4(b); ()
    }
  }

  test("mp4 encode->box-walk round trips hold for arbitrary payloads") {
    forAllSeeded(Gen.zip(Gen.choose(0L, 5000L), rawBytes), 150) {
      case (id, payload) =>
        val m = parseMp4(encodeMp4(id, payload))
        assert(m.isDefined, s"id=$id len=${payload.length}")
        assert(m.get.majorBrand == "isom")
        assert(m.get.nTracks == mp4Tracks(id))
        assert(m.get.ftypBytes == 24L)
        assert(m.get.moovBytes == 116L + mp4Tracks(id) * 100L)
        assert(m.get.mdatBytes == 8L + payload.length)
        assert(m.get.durationMs == payload.length.toLong)
        assert(m.get.width == mp4Width(id) && m.get.height == mp4Height(id))
        // the corrupt slice must fail through the containment check
        assert(parseMp4(corruptMp4(encodeMp4(id, payload))).isEmpty)
        // and the sniffing chain must classify the clean container
        val h = parseHeader(encodeMp4(id, payload))
        assert(h.exists(_.format == "mp4"))
        // mdat slice round trip: the walker recovers the payload bytes
        assert(mp4MdatPayload(encodeMp4(id, payload))
          .exists(java.util.Arrays.equals(_, payload)))
    }
  }

  test("avi encode->riff-walk round trips hold for arbitrary payloads") {
    forAllSeeded(Gen.zip(Gen.choose(0L, 5000L), rawBytes), 150) {
      case (id, payload) =>
        val raw = encodeAvi(id, payload)
        val m = parseAvi(raw)
        assert(m.isDefined, s"id=$id len=${payload.length}")
        val frames = aviFrames(payload.length.toLong)
        assert(m.get.nStreams == aviStreams(id))
        assert(m.get.totalFrames == frames.toLong)
        assert(m.get.width == mp4Width(id) && m.get.height == mp4Height(id))
        assert(m.get.nVideoChunks == frames.toLong)
        assert(m.get.idxEntries == frames.toLong)
        val lastLen = payload.length - 64 * (frames - 1)
        assert(m.get.moviListBytes ==
          4L + 72L * (frames - 1) + 8L + lastLen + (lastLen & 1))
        // the corrupt slice must fail through the containment check
        assert(parseAvi(corruptAvi(raw)).isEmpty)
        // truncation (header, mid-movi, last byte) must reject, never throw
        Seq(raw.length / 4, raw.length / 2, raw.length - 1).foreach { cut =>
          assert(parseAvi(raw.take(cut)).isEmpty, s"cut=$cut parsed")
        }
    }
  }

  test("avi walk rejects structural lies: idx1 misalignment, strl census drift") {
    val raw = encodeAvi(7L, Array.tabulate(130)(_.toByte)) // odd tail: pad path
    assert(parseAvi(raw).isDefined)
    // break idx1 into a non-multiple of 16
    val badIdx = raw.clone()
    val idxOff = raw.length - 16 * aviFrames(130L) - 8
    assert(new String(badIdx, idxOff, 4, US_ASCII) == "idx1")
    ByteBuffer.wrap(badIdx).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(idxOff + 4, 16 * aviFrames(130L) - 3)
    assert(parseAvi(badIdx).isEmpty)
    // lie about the stream count: avih says 9, strl census disagrees
    val badStreams = raw.clone()
    ByteBuffer.wrap(badStreams).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(12 + 8 + 4 + 8 + 24, 9)
    assert(parseAvi(badStreams).isEmpty)
  }

  test("annex-b encode->walk round trips for arbitrary payloads incl. zero runs") {
    // raw binary payloads (00-heavy ones stress emulation prevention
    // and start-code disambiguation) must round-trip exactly
    val zeroHeavy: Gen[Array[Byte]] = Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        3 -> Gen.const(0.toByte), 1 -> Gen.const(1.toByte),
        1 -> Gen.const(3.toByte),
        2 -> Gen.choose(Byte.MinValue, Byte.MaxValue))).map(_.toArray))
    forAllSeeded(Gen.zip(Gen.choose(0L, 5000L), Gen.oneOf(rawBytes, zeroHeavy)), 200) {
      case (id, payload) =>
        val nals = parseAnnexB(encodeAnnexB(id, payload))
        assert(nals.isDefined, s"id=$id len=${payload.length}")
        val ns = h264Slices(payload.length.toLong)
        val got = nals.get
        assert(got.size == 2 + ns)
        assert(got.head.nalType == 7 && got.head.rbspBytes == 6)
        assert(got(1).nalType == 8 && got(1).rbspBytes == 4)
        val slices = got.drop(2)
        assert(slices.zipWithIndex.forall { case (x, s) =>
          x.nalType == (if (s % 8 == 0) 5 else 1) })
        assert(got.iterator.map(_.rbspBytes.toLong).sum ==
          10L + 3L * ns + payload.length)
    }
  }

  test("annex-b walk never throws and rejects malformed streams whole") {
    forAllSeeded(rawBytes, 300) { b => parseAnnexB(b); () }
    forAllSeeded(Gen.zip(Gen.choose(0L, 5000L), rawBytes), 80) {
      case (id, payload) =>
        val clean = encodeAnnexB(id, payload)
        // broken first start code: whole stream rejects
        val broken = clean.clone(); broken(3) = 2
        assert(parseAnnexB(broken).isEmpty)
        // forbidden_zero_bit set on the first NAL header
        val fbit = clean.clone(); fbit(4) = (fbit(4) | 0x80).toByte
        assert(parseAnnexB(fbit).isEmpty)
        // truncation INTO a start code leaves an empty NAL -> reject;
        // truncation into a body is indistinguishable from a shorter
        // body in raw byte-stream format, so the walk still parses but
        // the rbsp total shrinks (the q140 hash would catch it)
        val atSecondStart = clean.length - payload.length - 1
        val cutNals = parseAnnexB(java.util.Arrays.copyOf(clean, clean.length - 1))
        assert(cutNals.forall(_.map(_.rbspBytes.toLong).sum <
          10L + 3L * h264Slices(payload.length.toLong) + payload.length))
        assert(atSecondStart > 0)
    }
    // a stream not leading with a start code rejects
    assert(parseAnnexB(Array[Byte](1, 0, 0, 1, 0x65)).isEmpty)
    assert(parseAnnexB(null).isEmpty)
  }

  test("mdat slice survives non-canonical box order and absent mdat") {
    forAllSeeded(Gen.zip(Gen.choose(0L, 5000L), rawBytes), 60) {
      case (id, payload) =>
        val canon = encodeMp4(id, payload)
        val m = parseMp4(canon).get
        val ftyp = canon.slice(0, m.ftypBytes.toInt)
        val moov = canon.slice(m.ftypBytes.toInt, (m.ftypBytes + m.moovBytes).toInt)
        val mdat = canon.slice((m.ftypBytes + m.moovBytes).toInt, canon.length)
        // mdat BEFORE moov is a conforming layout; the slice must come
        // from the walk's recorded offsets, not ftyp+moov arithmetic
        val reordered = ftyp ++ mdat ++ moov
        assert(parseMp4(reordered).isDefined)
        assert(mp4MdatPayload(reordered)
          .exists(java.util.Arrays.equals(_, payload)))
        // an interleaved free box shifts mdat further — still exact
        val free = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
          .putInt(16).put("free".getBytes(US_ASCII)).putLong(0L).array()
        val shifted = ftyp ++ free ++ moov ++ mdat
        assert(mp4MdatPayload(shifted)
          .exists(java.util.Arrays.equals(_, payload)))
        // no mdat at all: parse succeeds (mdatBytes 0), slice is None
        val noMdat = ftyp ++ moov
        assert(parseMp4(noMdat).exists(_.mdatBytes == 0L))
        assert(mp4MdatPayload(noMdat).isEmpty)
    }
  }

  test("encode->parse round trips hold for arbitrary unicode text") {
    val texts = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const("héllo wörld ☃"),
      Gen.const("多字节 текст"), Gen.const(""))).map(_.mkString(" "))
    forAllSeeded(Gen.zip(Gen.choose(0L, 5000L), texts), 100) {
      case (id, text) =>
        val m = parseHeader(encode(id, text))
        if (id % 37 == 0) assert(m.isEmpty)
        else {
          assert(m.isDefined, s"id=$id text=${text.take(20)}")
          val fmt = Seq("png", "jpeg", "wav")((id % 3).toInt)
          assert(m.get.format == fmt)
        }
        val px = decodePngPixels(encodePngImage(id, text))
        if (id % 41 == 0) assert(px.isEmpty)
        else assert(px.exists(_._3.length ==
          pngPixelWidth(id) * pngPixelHeight(id) * 3))
    }
  }

  test("pcm decode round trips arbitrary sample payloads") {
    val payloads = Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    forAllSeeded(Gen.zip(Gen.choose(0L, 999L), payloads), 100) {
      case (k, payload) =>
        val id = k * 3 + 2 // any wav-shaped id works; corruption not applied here
        val s = wavPcmSamples(encodeWav(id, payload)).get
        assert(s.length == payload.length / 2)
        s.zipWithIndex.foreach { case (v, i) =>
          val want = ((payload(2 * i) & 0xFF) | ((payload(2 * i + 1) & 0xFF) << 8)).toShort
          assert(v == want)
        }
    }
  }

  test("5-format encodeExt->parse round trips hold for arbitrary unicode text") {
    val texts = Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr, Gen.const("héllo wörld ☃"),
      Gen.const("多字节 текст"), Gen.const(""))).map(_.mkString(" "))
    forAllSeeded(Gen.zip(Gen.choose(0L, 5000L), texts), 100) {
      case (id, text) =>
        val m = parseHeader(encodeExt(id, text))
        if (id % 37 == 0) assert(m.isEmpty, s"corrupt id=$id must not parse")
        else {
          assert(m.isDefined, s"id=$id text=${text.take(20)}")
          val fmt = Seq("png", "jpeg", "wav", "bmp", "gif")((id % 5).toInt)
          assert(m.get.format == fmt)
          if (fmt == "bmp") {
            assert(m.get.width.contains(bmpWidth(id)))
            assert(m.get.height.contains(bmpHeight(id))) // magnitude, even top-down
          }
          if (fmt == "gif") {
            assert(m.get.width.contains(gifWidth(id)))
            assert(m.get.height.contains(gifHeight(id)))
            assert(m.get.bitDepth.contains(gifColourRes(id)))
          }
        }
    }
  }

  test("foreign BMP and GIF headers parse; malformed variants reject") {
    val bmp = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
    bmp.putInt(40).putInt(640).putInt(-480) // top-down height
    bmp.putShort(1.toShort).putShort(24.toShort)
    bmp.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    val m = parseBmp(bmp.array()).get
    assert(m.format == "bmp" && m.width.contains(640) && m.height.contains(480))
    assert(m.channels.contains(3) && m.bitDepth.contains(8))
    // planes != 1 is malformed
    val bad = bmp.array().clone(); bad(26) = 2
    assert(parseBmp(bad).isEmpty)

    val gif = "GIF89a".getBytes(US_ASCII) ++
      Array[Byte](0x40, 0x01, 0xF0.toByte, 0x00, 0x77, 0x00, 0x00)
    val g = parseGif(gif).get
    assert(g.format == "gif" && g.width.contains(0x140) && g.height.contains(0xF0))
    assert(parseGif("GIF90a1234567".getBytes(US_ASCII)).isEmpty)
    // the sniffing chain routes by magic
    assert(parseHeader(bmp.array()).exists(_.format == "bmp"))
    assert(parseHeader(gif).exists(_.format == "gif"))
  }
}
