package graft.operators

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.MediaCodec._

/** Real-format codec tests. The round-trip tests cover our own encoder;
  * the hand-built-bytes tests prove the parsers implement the PUBLIC
  * format grammars (foreign chunk/segment layouts our encoder never
  * emits), not just the mirror of our writer. */
class MediaCodecByteSpec extends AnyFunSuite {

  // --- round trips over the deterministic encoder --------------------

  test("png round trip: dims, depth, channels, CRC-valid") {
    val b = encodePng(6L, "hello png".getBytes(UTF_8))
    val m = parseHeader(b).get
    assert(m.format == "png")
    assert(m.width.contains(pngWidth(6L)) && m.height.contains(pngHeight(6L)))
    assert(m.bitDepth.contains(8) && m.channels.contains(3))
    assert(m.sampleRate.isEmpty && m.durationMs.isEmpty)
    assert(b.length == 57 + 9)
  }

  test("jpeg round trip: dims from SOF0 behind APP0+COM") {
    val b = encodeJpeg(7L, "hello jpeg".getBytes(UTF_8))
    val m = parseHeader(b).get
    assert(m.format == "jpeg")
    assert(m.width.contains(jpegWidth(7L)) && m.height.contains(jpegHeight(7L)))
    assert(m.bitDepth.contains(8) && m.channels.contains(3))
    assert(b.length == 45 + 10)
  }

  test("jpeg round trip survives a COM overflow payload (> 65000 bytes)") {
    val big = Array.fill[Byte](70000)('x')
    val b = encodeJpeg(7L, big)
    assert(b.length == 45 + 70000)
    val m = parseHeader(b).get
    assert(m.format == "jpeg" && m.width.contains(jpegWidth(7L)))
  }

  test("wav round trip: rate, channels, floor duration; odd payload padded") {
    val payload = Array.fill[Byte](12345)('s') // odd → pad byte
    val b = encodeWav(5L, payload)
    assert(b.length == 44 + 12345 + 1)
    val m = parseHeader(b).get
    assert(m.format == "wav")
    assert(m.channels.contains(wavChannels(5L)))
    assert(m.sampleRate.contains(wavSampleRate(5L)))
    assert(m.bitDepth.contains(16))
    val byteRate = wavSampleRate(5L) * wavChannels(5L) * 2
    assert(m.durationMs.contains(12345L * 1000 / byteRate))
  }

  // --- corruption hits the intended failure path ----------------------

  test("corrupted png (flipped IHDR CRC) fails CRC verification, not magic") {
    val ok = encodePng(0L, "x".getBytes(UTF_8))
    assert(parseHeader(ok).isDefined)
    val bad = corrupt(0L, ok)
    assert(bad.length == ok.length) // still a full, signature-valid file
    assert(parseHeader(bad).isEmpty)
  }

  test("corrupted jpeg (truncated mid-APP0) fails bounds, wav fails form type") {
    assert(parseHeader(corrupt(1L, encodeJpeg(1L, "x".getBytes(UTF_8)))).isEmpty)
    assert(parseHeader(corrupt(2L, encodeWav(2L, "x".getBytes(UTF_8)))).isEmpty)
  }

  test("bmp round trip: dims, bpp classes, exact byte count, top-down height") {
    for (id <- Seq(3L, 13L, 23L)) { // one per bpp class (id % 3 = 0/1/2)
      val b = encodeBmp(id, "hello bmp".getBytes(UTF_8))
      assert(b.length == 54 + 9)
      val m = parseHeader(b).get
      assert(m.format == "bmp")
      assert(m.width.contains(bmpWidth(id)) && m.height.contains(bmpHeight(id)))
      assert(m.channels.contains(bmpBpp(id) / 8) && m.bitDepth.contains(8))
    }
    // doc 28 (% 7 == 0) stores a negative height; parser reports magnitude
    val td = encodeBmp(28L, "x".getBytes(UTF_8))
    assert(ByteBuffer.wrap(td).order(ByteOrder.LITTLE_ENDIAN).getInt(22) < 0)
    assert(parseHeader(td).get.height.contains(bmpHeight(28L)))
  }

  test("gif round trip: dims, colour resolution, exact byte count, trailer") {
    val b = encodeGif(9L, "hello gif".getBytes(UTF_8))
    assert(b.length == 14 + 9 && b.last == 0x3B)
    val m = parseHeader(b).get
    assert(m.format == "gif")
    assert(m.width.contains(gifWidth(9L)) && m.height.contains(gifHeight(9L)))
    assert(m.bitDepth.contains(gifColourRes(9L)) && m.channels.contains(1))
  }

  test("corruptExt hits a distinct failure path per format, lengths as ledgered") {
    // ids ≡ 0 (mod 37) spanning all five doc_id % 5 classes
    for (id <- Seq(0L, 111L, 37L, 148L, 74L)) {
      val text = "payload"
      val good = (id % 5) match {
        case 0 => encodePng(id, text.getBytes(UTF_8))
        case 1 => encodeJpeg(id, text.getBytes(UTF_8))
        case 2 => encodeWav(id, text.getBytes(UTF_8))
        case 3 => encodeBmp(id, text.getBytes(UTF_8))
        case _ => encodeGif(id, text.getBytes(UTF_8))
      }
      assert(parseHeader(good).isDefined, s"id=$id")
      val bad = encodeExt(id, text)
      assert(parseHeader(bad).isEmpty, s"id=$id corrupt variant parsed")
      // only the JPEG path truncates; all others keep the full length
      if (id % 5 == 1) assert(bad.length == 10)
      else assert(bad.length == good.length)
    }
  }

  // --- foreign layouts our encoder never produces ---------------------

  test("jpeg parser walks unknown APPn/DQT segments and RSTn markers to find SOF2") {
    val buf = ByteBuffer.allocate(64)
    buf.put(0xFF.toByte).put(0xD8.toByte)                    // SOI
    buf.put(0xFF.toByte).put(0xE1.toByte).putShort(6)        // APP1 (Exif-ish)
    buf.put(Array[Byte](1, 2, 3, 4))
    buf.put(0xFF.toByte).put(0x01.toByte)                    // TEM, stand-alone
    buf.put(0xFF.toByte).put(0xDB.toByte).putShort(4)        // DQT
    buf.put(Array[Byte](9, 9))
    buf.put(0xFF.toByte).put(0xC2.toByte).putShort(11)       // SOF2 (progressive)
    buf.put(12.toByte)                                       // precision 12
    buf.putShort(480.toShort).putShort(640.toShort)
    buf.put(1.toByte)                                        // grayscale
    buf.put(1.toByte).put(0x11.toByte).put(0.toByte)
    val m = parseJpeg(java.util.Arrays.copyOf(buf.array(), buf.position())).get
    assert(m.width.contains(640) && m.height.contains(480))
    assert(m.bitDepth.contains(12) && m.channels.contains(1))
  }

  test("jpeg parser does not mistake DHT (C4) for a frame header") {
    val buf = ByteBuffer.allocate(32)
    buf.put(0xFF.toByte).put(0xD8.toByte)
    buf.put(0xFF.toByte).put(0xC4.toByte).putShort(9)        // DHT, SOF-shaped body
    buf.put(8.toByte).putShort(1.toShort).putShort(1.toShort).put(1.toByte).put(0.toByte)
    buf.put(0xFF.toByte).put(0xD9.toByte)                    // EOI
    assert(parseJpeg(java.util.Arrays.copyOf(buf.array(), buf.position())).isEmpty)
  }

  test("wav parser skips LIST chunk before fmt and tolerates fmt extension") {
    val buf = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(US_ASCII)).putInt(0).put("WAVE".getBytes(US_ASCII))
    buf.put("LIST".getBytes(US_ASCII)).putInt(5)             // odd size → padded
    buf.put(Array[Byte]('I', 'N', 'F', 'O', 7, 0))
    buf.put("fmt ".getBytes(US_ASCII)).putInt(18)            // WAVE_FORMAT + cbSize
    buf.putShort(1.toShort).putShort(2.toShort)              // PCM, stereo
    buf.putInt(44100).putInt(44100 * 4)
    buf.putShort(4.toShort).putShort(16.toShort).putShort(0.toShort)
    buf.put("data".getBytes(US_ASCII)).putInt(8)
    buf.put(Array.fill[Byte](8)(0))
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).putInt(4, bytes.length - 8)
    val m = parseWav(bytes).get
    assert(m.channels.contains(2) && m.sampleRate.contains(44100))
    assert(m.durationMs.contains(8L * 1000 / (44100 * 4)))
  }

  test("wavPcmSamples decodes signed 16-bit LE, drops trailing odd byte") {
    // payload bytes: sample0 = 0x0102 = 258, sample1 = 0xFF80 -> -128
    // little-endian, sample2 = 0x8000 -> -32768, + one dangling byte
    val payload = Array[Byte](0x02, 0x01, 0x80.toByte, 0xFF.toByte,
      0x00, 0x80.toByte, 0x7F)
    val b = encodeWav(5L, payload)
    val s = wavPcmSamples(b).get
    assert(s.toSeq == Seq[Short](258, -128, -32768))
    assert(wavPcmSamples(corrupt(2L, b)).isEmpty)
    // a non-WAV container is a decoder error, not an exception
    assert(wavPcmSamples(encodePng(0L, payload)).isEmpty)
  }

  test("png pixel round trip: real zlib, exact pixels, cycled payload") {
    val text = "abcXYZ"
    val b = encodePngImage(2L, text)
    val (w, h, px) = decodePngPixels(b).get
    assert(w == pngPixelWidth(2L) && h == pngPixelHeight(2L))
    val payload = text.getBytes(UTF_8)
    val want = Array.tabulate(w * h * 3)(i => payload(i % payload.length))
    assert(px.toSeq == want.toSeq)
  }

  test("png pixel decoder survives a split IDAT stream (real-file shape)") {
    val b = encodePngImage(3L, "stream me")
    // rebuild with the IDAT payload split into two chunks
    val idatLen = ByteBuffer.wrap(b, 33, 4).getInt()
    val z = java.util.Arrays.copyOfRange(b, 41, 41 + idatLen)
    val cut = z.length / 2
    val rebuilt = java.util.Arrays.copyOfRange(b, 0, 33) ++
      pngChunkForTest("IDAT", java.util.Arrays.copyOfRange(z, 0, cut)) ++
      pngChunkForTest("IDAT", java.util.Arrays.copyOfRange(z, cut, z.length)) ++
      pngChunkForTest("IEND", Array.emptyByteArray)
    assert(decodePngPixels(rebuilt).map(_._3.toSeq) ==
      decodePngPixels(b).map(_._3.toSeq))
  }

  test("png pixel decoder rejects corrupt zlib, bad IDAT CRC, non-zero filter") {
    val b = encodePngImage(0L, "x") // doc 0: %41 == 0 -> zlib header flipped
    assert(decodePngPixels(b).isEmpty)
    val good = encodePngImage(1L, "x")
    assert(decodePngPixels(good).isDefined)
    val badCrc = good.clone()
    badCrc(badCrc.length - 5 - 12) = (badCrc(badCrc.length - 5 - 12) ^ 1).toByte
    // (a flip inside the IDAT chunk body breaks that chunk's CRC)
    assert(decodePngPixels(badCrc).isEmpty)
  }

  test("dHash63 matches a from-scratch box-filter reference on a real decode") {
    // independent recompute of the documented formula: 2x2 integer box
    // means on the 20x14 standard thumbnail, then adjacent-mean rises
    val text = "perceptual hash me"
    val b = encodePngImageSized(7L, text, 20, 14)
    val (w, h, px) = decodePngPixels(b).get
    assert(w == 20 && h == 14)
    def gray(x: Int, y: Int) = {
      val k = 3 * (y * 20 + x)
      ((px(k) & 0xFF) + (px(k + 1) & 0xFF) + (px(k + 2) & 0xFF)) / 3
    }
    def boxMean(i: Int, j: Int) =
      (gray(2 * i, 2 * j) + gray(2 * i + 1, 2 * j) +
        gray(2 * i, 2 * j + 1) + gray(2 * i + 1, 2 * j + 1)) / 4
    var want = 0L
    for (j <- 0 until 7; i <- 0 until 9) {
      if (boxMean(i + 1, j) > boxMean(i, j)) want |= 1L << (j * 9 + i)
    }
    assert(dHash63(20, 14, px) == want)
    assert(want >= 0L, "63-bit hash must stay non-negative")
    // identical text + identical dims => identical bytes => hamming 0
    assert(dHash63(20, 14, decodePngPixels(encodePngImageSized(99L, text, 20, 14))
      .get._3) == want)
    // degenerate-dimension clamp: narrower than the cell grid still hashes
    assert(dHash63(8, 8, decodePngPixels(encodePngImageSized(1L, text, 8, 8))
      .get._3) >= 0L)
  }

  test("box-filter dHash is robust to single-pixel noise; the sample grid was not") {
    // strong horizontal gradient: cell means rise by ~16 gray levels per
    // column, so a one-pixel wobble (<= 255/4 = 63 on one mean... use a
    // modest +-40 spike: <= 10 on a 2x2 mean) cannot reorder any
    // adjacent pair of means
    val w = 20; val h = 14
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px(3 * (y * w + x) + c) = (x * 12).toByte
    val clean = dHash63(w, h, px)
    for (spike <- Seq(40, -40)) {
      val noisy = px.clone()
      val b = 3 * (6 * w + 9) // one channel of pixel (9, 6)
      noisy(b) = math.max(0, math.min(255, (noisy(b) & 0xFF) + spike)).toByte
      assert(dHash63(w, h, noisy) == clean,
        s"single-pixel spike $spike flipped the box-filter hash")
      // the old nearest-neighbour sampler read exactly one pixel per
      // grid point: the same spike at a sampled point flips its bit
      def nnHash(p: Array[Byte]): Long = {
        def gray(x: Int, y: Int) = {
          val k = 3 * (y * w + x)
          ((p(k) & 0xFF) + (p(k + 1) & 0xFF) + (p(k + 2) & 0xFF)) / 3
        }
        var hh = 0L
        for (j <- 0 until 7; i <- 0 until 9)
          if (gray((i + 1) * w / 10, j * h / 7) > gray(i * w / 10, j * h / 7))
            hh |= 1L << (j * 9 + i)
        hh
      }
      val spiky = px.clone()
      // hit a sampled grid point hard: x = 4*20/10 = 8, y = 3*14/7 = 6
      val sb = 3 * (6 * w + 8)
      spiky(sb) = math.max(0, math.min(255, (spiky(sb) & 0xFF) + 120)).toByte
      spiky(sb + 1) = spiky(sb)
      spiky(sb + 2) = spiky(sb)
      assert(nnHash(spiky) != nnHash(px),
        "sanity: the old sampler WAS noise-sensitive at a grid point")
      assert(dHash63(w, h, spiky) == clean ||
        java.lang.Long.bitCount(dHash63(w, h, spiky) ^ clean) <= 1,
        "box filter bounds a large single-pixel spike to at most one bit")
    }
  }

  test("audioFingerprint matches a from-scratch reference over decoded PCM") {
    val text = "fingerprint this audio payload with some variation 12345"
    val samples = wavPcmSamples(encodeWav(8L, text.getBytes(UTF_8))).get
    val n = samples.length
    def frame(f: Int) = samples.slice(f * n / 21, (f + 1) * n / 21)
    val e = (0 until 21).map(f => frame(f).map(s => math.abs(s.toInt).toLong).sum)
    val z = (0 until 21).map { f =>
      val seg = frame(f)
      (1 until seg.length).count(i => (seg(i) >= 0) != (seg(i - 1) >= 0)).toLong
    }
    val p = (0 until 21).map(f =>
      (frame(f).map(s => math.abs(s.toInt).toLong) :+ 0L).max)
    var want = 0L
    for (k <- 0 until 20) {
      if (e(k + 1) > e(k)) want |= 1L << k
      if (z(k + 1) > z(k)) want |= 1L << (20 + k)
      if (p(k + 1) > p(k)) want |= 1L << (40 + k)
    }
    assert(audioFingerprint(samples) == want)
    assert(want >= 0L && (want >> 60) == 0L, "fingerprint stays in 60 bits")
    // edge: empty stream → all features zero → fingerprint 0
    assert(audioFingerprint(Array.empty[Short]) == 0L)
    // identical samples → hamming 0, the exact-dup slice
    assert(audioFingerprint(samples.clone()) == want)
  }

  test("png pixel decoder rejects CRC-valid huge dimensions without allocating") {
    // a hostile-but-well-formed IHDR can claim dims whose pixel-buffer
    // size overflows Int (negative allocation) or commits gigabytes
    // before any inflate check; both must yield None, never a throw
    for ((w, h) <- Seq((1 << 30, 1 << 30), (0x7FFFFFFF, 2), (40000, 40000))) {
      val b = encodePngImage(1L, "x").clone()
      ByteBuffer.wrap(b, 16, 4).putInt(w)
      ByteBuffer.wrap(b, 20, 4).putInt(h)
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 4 + 13) // re-sign type + IHDR data
      ByteBuffer.wrap(b, 29, 4).putInt(crc.getValue.toInt)
      assert(parsePng(b).isDefined, "rewritten IHDR must stay CRC-valid")
      assert(decodePngPixels(b).isEmpty)
    }
  }

  private def pngChunkForTest(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(US_ASCII)
    val buf = ByteBuffer.allocate(12 + data.length)
    buf.putInt(data.length).put(t).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  test("parsers bound-check hostile inputs without throwing") {
    val hostiles = Seq(
      Array.emptyByteArray,
      Array[Byte](0xFF.toByte, 0xD8.toByte),                  // bare SOI
      PngSignatureForTest,                                    // signature only
      "RIFFxxxxWAVE".getBytes(US_ASCII),                      // no chunks
      "RIFF".getBytes(US_ASCII) ++ Array.fill[Byte](40)(0x7F),
      encodeWav(2L, "abc".getBytes(UTF_8)).dropRight(2),      // truncated data
      Array.fill[Byte](64)(0xFF.toByte))
    hostiles.foreach(h => assert(parseHeader(h).isEmpty))
  }

  private val PngSignatureForTest: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
}

/** Distributed-surface tests: drop-with-audit accounting and the
  * narrow (no-shuffle) plan contract for the decode path. */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "corrupt png row"), (1L, "jpeg one"), (2L, "wav one"),
    (3L, "png two"), (4L, "jpeg two"), (5L, "wav two odd"),
    (37L, "corrupt jpeg"), (74L, "corrupt wav")
  ).toDF("doc_id", "text")

  test("extractMetadata drops exactly the corrupted rows; audit counts them") {
    val media = MediaCodec.attachMedia(docs)
    val meta = MediaCodec.extractMetadata(media).collect()
    assert(meta.map(_.doc_id).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val counts = MediaCodec.audit(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("corrupt" -> 3L, "png" -> 1L, "jpeg" -> 2L, "wav" -> 2L))
  }

  test("metadata fields match the format: image vs audio nulls") {
    val meta = MediaCodec.extractMetadata(MediaCodec.attachMedia(docs))
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(3L).format == "png" && meta(3L).sample_rate.isEmpty
      && meta(3L).width.contains(MediaCodec.pngWidth(3L)))
    assert(meta(4L).format == "jpeg" && meta(4L).duration_ms.isEmpty)
    assert(meta(2L).format == "wav" && meta(2L).width.isEmpty
      && meta(2L).sample_rate.contains(MediaCodec.wavSampleRate(2L)))
  }

  test("decode path is narrow: no Exchange below the metadata extraction") {
    val plan = MediaCodec.extractMetadata(MediaCodec.attachMedia(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in decode plan:\n$plan")
  }

  test("videoFrameHashes == from-scratch reference; corrupt %47 drops") {
    val vdocs = Seq(
      (0L, "x" * 50), // 0 % 47 == 0: corrupt, must drop
      (1L, "the quick brown fox jumps over the lazy dog " * 4), // 176 B
      (2L, "abcdefgh" * 20), // 160 B
      (3L, "short")) // one ragged frame
      .toDF("doc_id", "text")
    val got = MediaCodec.videoFrameHashes(MediaCodec.attachVideo(vdocs))
      .collect().map(r => (r.doc_id, r.frame_idx) -> r.vhash).toMap
    // reference: fixed 48-byte frames of the raw text bytes, every 2nd,
    // canvas pixel k reads frame byte (k*192/840) % flen, dHash63
    val want = Seq(1L, 2L, 3L).flatMap { id =>
      val tb = vdocs.collect().find(_.getLong(0) == id).get.getString(1)
        .getBytes(UTF_8)
      val nF = (tb.length + 47) / 48
      (0 until nF by 2).map { f =>
        val off = f * 48
        val flen = math.min(48, tb.length - off)
        val px = Array.tabulate(840)(k => tb(off + (k * 192 / 840) % flen))
        (id, f) -> MediaCodec.dHash63(20, 14, px)
      }
    }.toMap
    assert(got == want)
    assert(!got.keySet.exists(_._1 == 0L))
  }

  test("videoFrameDupPairs counts exact frame matches, honors minFrames") {
    // ids 1 and 2 share text (identical frames at every index); id 3
    // shares only its first 48 bytes with them (one matching frame)
    val base = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKL" // 48 B
    val vdocs = Seq(
      (1L, base + base + base), // frames 0,2 sampled (nF=3)
      (2L, base + base + base),
      (3L, base + "Z" * 96)) // frame 0 == base, frame 2 differs
      .toDF("doc_id", "text")
    val fh = MediaCodec.videoFrameHashes(MediaCodec.attachVideo(vdocs)).toDF()
    val hashes = fh.collect().map(r =>
      (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // brute-force reference pair counts at hamming <= 2
    def brute(minF: Int) = hashes.keys.toSeq.flatMap { ka =>
      hashes.keys.toSeq.collect {
        case kb if ka._1 < kb._1 &&
          java.lang.Long.bitCount(hashes(ka) ^ hashes(kb)) <= 2 =>
          (ka._1, kb._1)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minF)
    val got2 = Dedup.videoFrameDupPairs(fh, "doc_id", "frame_idx", "vhash",
        maxHamming = 2, minFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got2 == brute(2))
    assert(got2.contains((1L, 2L))) // identical videos pair
    val got1 = Dedup.videoFrameDupPairs(fh, "doc_id", "frame_idx", "vhash",
        maxHamming = 2, minFrames = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got1 == brute(1))
  }
}
