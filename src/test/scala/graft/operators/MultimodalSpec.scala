package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalCodecSpec extends AnyFunSuite {
  test("media round-trip: header carries dimensions and payload length") {
    val m = Multimodal.encodeMedia(42L, "hello world")
    assert(Multimodal.decodeHeader(m) ==
      Some((Multimodal.widthOf(42L), Multimodal.heightOf(42L), 11)))
  }

  test("foreign bytes fail decode (wrong magic / truncated)") {
    assert(Multimodal.decodeHeader("not a media file".getBytes).isEmpty)
    assert(Multimodal.decodeHeader(Array[Byte](1, 2, 3)).isEmpty)
    // valid magic but the declared payload exceeds the actual bytes:
    // must drop (decode error), not crash the payload read downstream
    val truncated = Multimodal.encodeMedia(1L, "hello").dropRight(3)
    assert(Multimodal.decodeHeader(truncated).isEmpty)
  }
}

class MultimodalSpec extends SparkSpec {
  test("corrupt media rows are dropped by the decode stages") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodeMedia(1L, "x" * 300)),
      Multimodal.MediaRow(2L, Array[Byte](9, 9, 9))).toDS()
    assert(Multimodal.extractMetadata(media).collect().map(_.doc_id).toSeq == Seq(1L))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.doc_id).toSeq == Seq(1L))
    assert(feats.head.n_frames == 2L && feats.head.checksum == 300L * 'x')
    // frames 0 and 2 of a 300-byte payload... only 0 exists at stride 2
    val frames = Multimodal.frameSample(media, every = 2).collect()
    assert(frames.map(f => (f.frame_idx, f.frame_off, f.frame_len)).toSeq ==
      Seq((0L, 16L, 256L)))
  }
}
