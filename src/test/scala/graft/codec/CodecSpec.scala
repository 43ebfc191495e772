package graft.codec

import org.scalatest.funsuite.AnyFunSuite

class ProtoWireSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("varint round-trip across the full unsigned range") {
    val edges = Seq(0L, 1L, 127L, 128L, 300L, 0xffffffffL, Long.MaxValue)
    val samples = edges ++ Seq.fill(500)(rnd.nextLong().abs)
    samples.foreach { v =>
      val w = new ProtoWriter; w.writeVarintRaw(v)
      assert(new ProtoReader(w.toBytes).readVarint() == v, s"varint $v")
    }
  }
  test("fixed32 round-trip including negative bit patterns") {
    val samples = Seq(0, 1, -1, Int.MinValue, Int.MaxValue, 500000000) ++
      Seq.fill(200)(rnd.nextInt())
    samples.foreach { v =>
      val w = new ProtoWriter; w.fixed32(9, v)
      val r = new ProtoReader(w.toBytes)
      assert(r.readTag() == ((9, 5)))
      assert(r.readFixed32() == v, s"fixed32 $v")
    }
  }
  test("truncated varint throws") {
    intercept[IllegalArgumentException] {
      new ProtoReader(Array(0x80.toByte)).readVarint()
    }
  }
  test("unknown fields are skippable") {
    val w = new ProtoWriter
    w.varint(99, 7L).bytes(98, Array[Byte](1, 2, 3)).fixed32(97, 42).varint(15, 1L)
    val r = new ProtoReader(w.toBytes)
    var frameType = -1
    while (r.hasNext) r.readTag() match {
      case (15, 0) => frameType = r.readVarint().toInt
      case (_, wt) => r.skip(wt)
    }
    assert(frameType == 1)
  }
}

class DnstapCodecSpec extends AnyFunSuite {
  private val wire = DnsWire.encode(0x1234, 0, isResponse = false,
    Seq(DnsWire.Question("example.com.", 1)))

  test("frame round-trip preserves every field the reference reads") {
    val f = DnstapCodec.Frame(DnstapCodec.TypeMessage, Some("ns1.example"),
      Some(DnstapCodec.Message(DnstapCodec.ClientQuery,
        queryAddress = Some(Array[Byte](192.toByte, 168.toByte, 1, 2)),
        queryPort = Some(53000), queryTimeSec = Some(1700000000L),
        queryTimeNsec = Some(500000000), queryMessage = Some(wire))))
    val got = DnstapCodec.decode(DnstapCodec.encode(f)).get
    assert(got.frameType == DnstapCodec.TypeMessage)
    assert(got.identity.contains("ns1.example"))
    val m = got.message.get
    assert(m.msgType == DnstapCodec.ClientQuery)
    assert(m.queryAddress.get.toSeq == Seq(192.toByte, 168.toByte, 1, 2))
    assert(m.queryPort.contains(53000))
    assert(m.queryTimeSec.contains(1700000000L))
    assert(m.queryTimeNsec.contains(500000000))
    assert(m.queryMessage.get.toSeq == wire.toSeq)
  }

  test("absent optional fields decode as None (drives P1/P5 fallbacks)") {
    val f = DnstapCodec.Frame(DnstapCodec.TypeMessage, None,
      Some(DnstapCodec.Message(DnstapCodec.ClientQuery, queryMessage = Some(wire))))
    val m = DnstapCodec.decode(DnstapCodec.encode(f)).get.message.get
    assert(m.queryPort.isEmpty && m.queryTimeSec.isEmpty && m.queryTimeNsec.isEmpty)
  }

  test("garbage bytes decode to None, not an exception") {
    assert(DnstapCodec.decode(Array[Byte](0x0b, 0x7f, -1, -1, -1, -1)).isEmpty)
  }
}

class DnsWireSpec extends AnyFunSuite {
  test("query round-trip: id, rcode, multi-question explode source") {
    val b = DnsWire.encode(0xbeef, 0, isResponse = false, Seq(
      DnsWire.Question("a.example.com.", 1), DnsWire.Question("b.example.org.", 28)))
    val m = DnsWire.parse(b).get
    assert(m.id == 0xbeef && m.rcode == 0)
    assert(m.questions == Seq(
      DnsWire.Question("a.example.com.", 1), DnsWire.Question("b.example.org.", 28)))
  }

  test("response rcode extraction (NXDOMAIN)") {
    val b = DnsWire.encode(7, 3, isResponse = true, Seq(DnsWire.Question("x.", 1)))
    assert(DnsWire.parse(b).get.rcode == 3)
  }

  test("compression pointer in qname is followed") {
    // hand-built: header + question "ptr.<pointer to offset 16>"
    val base = DnsWire.encode(1, 0, isResponse = false,
      Seq(DnsWire.Question("example.com.", 1)))
    // name at offset 12; craft second message whose name is 3"abc" + ptr->12
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    val qstart = out.size()
    out.write(3); out.write('a'); out.write('b'); out.write('c')
    out.write(0xc0); out.write(12) // pointer to "example.com." at offset 12
    out.write(0); out.write(1); out.write(0); out.write(1)
    val patched = out.toByteArray
    patched(5) = 2 // qdcount = 2
    val m = DnsWire.parse(patched).get
    assert(m.questions.map(_.name) ==
      Seq("example.com.", "abc.example.com."))
    assert(qstart == 12 + 12 + 4 + 1) // sanity: second question follows first
  }

  test("malformed input drops (truncated, bad pointer, short header)") {
    assert(DnsWire.parse(Array[Byte](1, 2, 3)).isEmpty)
    val loop = DnsWire.encode(1, 0, isResponse = false, Seq(DnsWire.Question("x.", 1)))
    loop(12) = 0xc0.toByte; loop(13) = 12 // self-pointing compression loop
    assert(DnsWire.parse(loop).isEmpty)
    val trunc = DnsWire.encode(1, 0, isResponse = false,
      Seq(DnsWire.Question("example.com.", 1))).dropRight(3)
    assert(DnsWire.parse(trunc).isEmpty)
  }

  test("root name renders as '.'") {
    val b = DnsWire.encode(1, 0, isResponse = false, Seq(DnsWire.Question(".", 255)))
    assert(DnsWire.parse(b).get.questions == Seq(DnsWire.Question(".", 255)))
  }

  test("seeded fuzz: decoders never throw on arbitrary or mutated bytes") {
    // a socket feeds these decoders attacker-controlled bytes; any escape
    // of the Option contract (an uncaught throw) would kill a reader task
    val rnd = new scala.util.Random(0xf00dL)
    (0 until 2000).foreach { _ =>
      val b = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      DnsWire.parse(b)
      DnstapCodec.decode(b)
    }
    // bit-flipped VALID messages probe deeper branches than pure noise
    val wire = DnsWire.encode(0x1234, 0, isResponse = false,
      Seq(DnsWire.Question("fuzz.example.com.", 1)))
    val frame = DnstapCodec.encode(DnstapCodec.Frame(DnstapCodec.TypeMessage,
      Some("ns"), Some(DnstapCodec.Message(DnstapCodec.ClientQuery,
        queryAddress = Some(Array[Byte](10, 0, 0, 1)), queryPort = Some(53),
        queryTimeSec = Some(1L), queryMessage = Some(wire)))))
    (0 until 2000).foreach { _ =>
      val w = wire.clone; w(rnd.nextInt(w.length)) = rnd.nextInt().toByte
      DnsWire.parse(w)
      val f = frame.clone; f(rnd.nextInt(f.length)) = rnd.nextInt().toByte
      DnstapCodec.decode(f)
    }
  }
}

class DnsTablesSpec extends AnyFunSuite {
  test("known codes") {
    assert(DnsTables.qtypeName(1) == "A")
    assert(DnsTables.qtypeName(28) == "AAAA")
    assert(DnsTables.qtypeName(65) == "HTTPS")
    assert(DnsTables.rcodeName(0) == "NOERROR")
    assert(DnsTables.rcodeName(3) == "NXDOMAIN")
  }
  test("unknown codes use miekg-style fallback") {
    assert(DnsTables.qtypeName(9999) == "TYPE9999")
    assert(DnsTables.rcodeName(77) == "RCODE77")
  }
}
