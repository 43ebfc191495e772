package graft.codec

import java.nio.charset.StandardCharsets.UTF_8

/** dnstap frame model + codec, per the public dnstap.proto schema
  * (dnstap.info / protobuf/dnstap.proto) — only the fields the reference
  * reads (/root/reference/src/dnstap/dnstap.go:242-372).
  */
object DnstapCodec {

  // Dnstap.Type
  val TypeMessage = 1
  // Message.Type values (public dnstap.proto enum)
  val ClientQuery = 5
  val ClientResponse = 6

  /** Message sub-record (field 14 of Dnstap). `None` ⇔ field absent —
    * absence drives the reference's fallback semantics (P1/P5). */
  final case class Message(
      msgType: Int,
      queryAddress: Option[Array[Byte]] = None,
      responseAddress: Option[Array[Byte]] = None,
      queryPort: Option[Int] = None,
      responsePort: Option[Int] = None,
      queryTimeSec: Option[Long] = None,
      queryTimeNsec: Option[Int] = None,
      queryMessage: Option[Array[Byte]] = None,
      responseTimeSec: Option[Long] = None,
      responseTimeNsec: Option[Int] = None,
      responseMessage: Option[Array[Byte]] = None)

  final case class Frame(
      frameType: Int,
      identity: Option[String] = None,
      message: Option[Message] = None)

  /** Decode one dnstap protobuf frame; None on malformed input. */
  def decode(bytes: Array[Byte]): Option[Frame] =
    try {
      var frameType = -1
      var identity: Option[String] = None
      var message: Option[Message] = None
      val r = new ProtoReader(bytes)
      while (r.hasNext) {
        r.readTag() match {
          case (1, 2)  => identity = Some(new String(r.readBytes(), UTF_8))
          case (14, 2) => message = Some(decodeMessage(r.readBytes()))
          case (15, 0) => frameType = r.readVarint().toInt
          case (_, w)  => r.skip(w)
        }
      }
      Some(Frame(frameType, identity, message))
    } catch { case _: Exception => None }

  private def decodeMessage(bytes: Array[Byte]): Message = {
    var m = Message(msgType = -1)
    val r = new ProtoReader(bytes)
    while (r.hasNext) {
      r.readTag() match {
        case (1, 0)  => m = m.copy(msgType = r.readVarint().toInt)
        case (4, 2)  => m = m.copy(queryAddress = Some(r.readBytes()))
        case (5, 2)  => m = m.copy(responseAddress = Some(r.readBytes()))
        case (6, 0)  => m = m.copy(queryPort = Some(r.readVarint().toInt))
        case (7, 0)  => m = m.copy(responsePort = Some(r.readVarint().toInt))
        case (8, 0)  => m = m.copy(queryTimeSec = Some(r.readVarint()))
        case (9, 5)  => m = m.copy(queryTimeNsec = Some(r.readFixed32()))
        case (10, 2) => m = m.copy(queryMessage = Some(r.readBytes()))
        case (11, 0) => m = m.copy(responseTimeSec = Some(r.readVarint()))
        case (12, 5) => m = m.copy(responseTimeNsec = Some(r.readFixed32()))
        case (13, 2) => m = m.copy(responseMessage = Some(r.readBytes()))
        case (_, w)  => r.skip(w)
      }
    }
    m
  }

  /** Encode a frame (fixture building + the file/socket source tests). */
  def encode(f: Frame): Array[Byte] = {
    val w = new ProtoWriter
    f.identity.foreach(id => w.string(1, id))
    f.message.foreach { m =>
      val mw = new ProtoWriter
      mw.varint(1, m.msgType.toLong)
      m.queryAddress.foreach(mw.bytes(4, _))
      m.responseAddress.foreach(mw.bytes(5, _))
      m.queryPort.foreach(p => mw.varint(6, p.toLong))
      m.responsePort.foreach(p => mw.varint(7, p.toLong))
      m.queryTimeSec.foreach(mw.varint(8, _))
      m.queryTimeNsec.foreach(mw.fixed32(9, _))
      m.queryMessage.foreach(mw.bytes(10, _))
      m.responseTimeSec.foreach(mw.varint(11, _))
      m.responseTimeNsec.foreach(mw.fixed32(12, _))
      m.responseMessage.foreach(mw.bytes(13, _))
      w.message(14, mw)
    }
    if (f.frameType >= 0) w.varint(15, f.frameType.toLong)
    w.toBytes
  }
}
