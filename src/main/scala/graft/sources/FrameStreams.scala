package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal frame-streams wire codec (the transport the reference's dnstap
  * source speaks: farsightsec frame-streams framing; see
  * /root/reference/src/dnstap/dnstap.go:164-210 — `go_dnstap.NewReader`
  * wraps a bidirectional framestream with a 1 MiB max frame).
  *
  * Wire format (all integers big-endian u32):
  *   - data frame:    `len payload` with `len > 0`
  *   - control frame: `0x00000000 clen cpayload`; cpayload is
  *     `ctype (field ftype flen fvalue)*`
  *
  * Control types: ACCEPT/START/STOP/READY/FINISH. A unidirectional sender
  * emits START, data frames, STOP. A bidirectional sender first emits
  * READY and waits for ACCEPT; the receiver answers STOP with FINISH.
  * Both modes are handled by [[FrameStreams.Reader]].
  */
object FrameStreams {

  val ControlAccept = 0x01
  val ControlStart  = 0x02
  val ControlStop   = 0x03
  val ControlReady  = 0x04
  val ControlFinish = 0x05

  val FieldContentType = 0x01
  val ContentTypeDnstap = "protobuf:dnstap.Dnstap"

  /** Hard frame-size guard, matching the reference decoder's
    * `NewDecoder(reader, 1<<20)` (dnstap.go:205). */
  val DefaultMaxFrameBytes: Int = 1 << 20

  def writeDataFrame(out: OutputStream, payload: Array[Byte]): Unit = {
    val d = new DataOutputStream(out)
    d.writeInt(payload.length)
    d.write(payload)
    d.flush()
  }

  def writeControlFrame(out: OutputStream, ctype: Int,
                        contentTypes: Seq[String] = Nil): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(ctype)
    contentTypes.foreach { ct =>
      val bytes = ct.getBytes(UTF_8)
      b.writeInt(FieldContentType)
      b.writeInt(bytes.length)
      b.write(bytes)
    }
    val d = new DataOutputStream(out)
    d.writeInt(0) // control-frame escape
    d.writeInt(body.size())
    body.writeTo(d)
    d.flush()
  }

  final case class ControlFrame(ctype: Int, contentTypes: Seq[String])

  def parseControlFrame(payload: Array[Byte]): ControlFrame = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(payload))
    val ctype = in.readInt()
    val cts = Seq.newBuilder[String]
    while (in.available() >= 8) {
      val field = in.readInt()
      val len = in.readInt()
      // the length is wire data: validate against the bytes actually
      // remaining BEFORE allocating — a corrupt/malicious field header
      // claiming Int.MaxValue would otherwise allocate ~2 GB on the
      // driver (and a negative length throws) ahead of any read
      if (len < 0 || len > in.available())
        return ControlFrame(ctype, cts.result())
      val v = new Array[Byte](len)
      in.readFully(v)
      if (field == FieldContentType) cts += new String(v, UTF_8)
    }
    ControlFrame(ctype, cts.result())
  }

  /** Pull-based reader for one connection; `reply` is the write side for
    * the bidirectional handshake (None ⇒ unidirectional peer). */
  final class Reader(in: InputStream, reply: Option[OutputStream] = None,
                     maxFrameBytes: Int = DefaultMaxFrameBytes) {
    private val d = new DataInputStream(in)
    private var finished = false

    /** Next data frame, or None when the stream ended (STOP/EOF). */
    def next(): Option[Array[Byte]] = {
      if (finished) return None
      try {
        while (true) {
          val len = d.readInt()
          if (len != 0) {
            require(len > 0 && len <= maxFrameBytes, s"frame of $len bytes exceeds cap $maxFrameBytes")
            val payload = new Array[Byte](len)
            d.readFully(payload)
            return Some(payload)
          } else {
            val clen = d.readInt()
            require(clen >= 4 && clen <= maxFrameBytes, s"control frame of $clen bytes")
            val cpayload = new Array[Byte](clen)
            d.readFully(cpayload)
            // replies are best-effort: a peer that already closed its read
            // side must not cost us the data frames it sent
            parseControlFrame(cpayload).ctype match {
              case ControlReady =>
                try reply.foreach(writeControlFrame(_, ControlAccept,
                  Seq(ContentTypeDnstap)))
                catch { case _: java.io.IOException => () }
              case ControlStart => () // data frames follow
              case ControlStop =>
                try reply.foreach(writeControlFrame(_, ControlFinish))
                catch { case _: java.io.IOException => () }
                finished = true
                return None
              case _ => () // ACCEPT/FINISH from a confused peer: ignore
            }
          }
        }
        None // unreachable
      } catch {
        case _: EOFException => finished = true; None
      }
    }
  }
}
