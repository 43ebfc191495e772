package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media ride
  * along as opaque `binary` columns with typed metadata, and the
  * decode / feature-extract / frame-sample stages run batch-wise over
  * partitions (`mapPartitions` on a typed Dataset — the Scala analog of
  * arrow-batched Python UDFs), so a real decoder drops in without
  * touching the plan shape.
  *
  * ==SYNTHETIC CONTAINER NOTICE==
  * `encodeMedia` / `decodeHeader` here implement a deterministic
  * synthetic format ("GRFT": a 16-byte header + the UTF-8 payload) that
  * keeps the q29–q31 plumbing oracle simple. REAL public-format codecs
  * — PNG IHDR with CRC verification, JPEG SOFn marker walk, WAV RIFF
  * chunk walk — live in [[MediaCodec]] (q102/q103) and share this
  * file's plan shape; full video/audio DECODE (pixels/samples, not
  * headers) still needs external codec libraries not present in this
  * container.
  *
  * Scale notes: every stage here is a narrow map — no shuffle, no
  * driver collect. Binary payloads stay inside the partition that read
  * them; only extracted (small, typed) metadata flows further. At 100 TB
  * that is the difference between moving pixels and moving integers.
  */
object Multimodal {

  val Magic: Int = 0x47524654 // "GRFT"
  val HeaderBytes: Int = 16

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MetaRow(doc_id: Long, format: String, width: Int,
                           height: Int, n_bytes: Long)
  final case class FeatureRow(doc_id: Long, n_bytes: Long, n_frames: Long,
                              checksum: Long, avg_codepoint: Long)
  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_off: Long,
                            frame_len: Long)

  /** Deterministic fake dimensions, derived from the id (stands in for
    * whatever the real container header would carry). */
  def widthOf(docId: Long): Int = (64 + docId % 1024).toInt
  def heightOf(docId: Long): Int = (64 + (docId * 7) % 768).toInt

  /** STUB encoder: header {magic, width, height, payloadLen} + payload. */
  def encodeMedia(docId: Long, text: String): Array[Byte] = {
    val payload = text.getBytes(UTF_8)
    val buf = ByteBuffer.allocate(HeaderBytes + payload.length)
    buf.putInt(Magic).putInt(widthOf(docId)).putInt(heightOf(docId))
      .putInt(payload.length)
    buf.put(payload)
    buf.array()
  }

  /** STUB decoder: parse the fake header; None on foreign bytes (a real
    * decoder's parse failure), so corrupt media filters out as null. */
  def decodeHeader(media: Array[Byte]): Option[(Int, Int, Int)] = {
    if (media.length < HeaderBytes) return None
    val buf = ByteBuffer.wrap(media)
    if (buf.getInt() != Magic) None
    else {
      val (w, h, payloadLen) = (buf.getInt(), buf.getInt(), buf.getInt())
      // a truncated/corrupt container whose declared length exceeds the
      // actual bytes must drop, not crash the downstream payload read
      if (payloadLen < 0 || HeaderBytes.toLong + payloadLen > media.length) None
      else Some((w, h, payloadLen))
    }
  }

  /** documents(doc_id, text, …) → (doc_id, media BINARY). */
  def attachMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => MediaRow(id, encodeMedia(id, text)) })
  }

  /** Batch decode: media binary → typed metadata. Rows whose media fails
    * to parse are dropped (decoder-error semantics). */
  def extractMetadata(media: Dataset[MediaRow]): Dataset[MetaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeHeader(m.media).map { case (w, h, payloadLen) =>
        MetaRow(m.doc_id, "grft", w, h, HeaderBytes.toLong + payloadLen)
      }
    })
  }

  /** Batch feature extraction over the decoded payload: frame count (one
    * frame per 256 payload bytes — the frame-sample stub's unit), codepoint
    * checksum, and mean codepoint (floor). A real pipeline would emit
    * embeddings here; the batching contract is identical. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeHeader(m.media).map { case (_, _, payloadLen) =>
        val payload = new String(m.media, HeaderBytes, payloadLen, UTF_8)
        var sum = 0L
        var n = 0L
        payload.codePoints().forEach { cp => sum += cp; n += 1 }
        FeatureRow(m.doc_id, HeaderBytes.toLong + payloadLen,
          (payloadLen + 255L) / 256L, sum % 1000000007L,
          if (n == 0) 0L else sum / n)
      }
    })
  }

  /** Frame sampling (video analog): one row per `every`-th 256-byte frame
    * with its byte range — explode without materializing frame bytes. */
  def frameSample(media: Dataset[MediaRow], every: Int = 2): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.flatMap { m =>
      decodeHeader(m.media).toSeq.flatMap { case (_, _, payloadLen) =>
        val nFrames = (payloadLen + 255L) / 256L
        (0L until nFrames by every.toLong).map { i =>
          val off = HeaderBytes + i * 256L
          val len = math.min(256L, payloadLen - i * 256L)
          FrameRow(m.doc_id, i, off, len)
        }
      }
    })
  }
}
