package graft.dns

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{DnsWire, DnstapCodec}

class DnstapRowsSpec extends AnyFunSuite {
  private val fixedNow = Instant.ofEpochSecond(1800000000L, 123000L)
  private val now = () => fixedNow

  private def queryFrame(questions: Seq[DnsWire.Question],
                         sec: Option[Long] = Some(1700000000L),
                         nsec: Option[Int] = Some(250000000),
                         port: Option[Int] = Some(4242)): DnstapCodec.Frame =
    DnstapCodec.Frame(DnstapCodec.TypeMessage, Some("ns1"),
      Some(DnstapCodec.Message(DnstapCodec.ClientQuery,
        queryAddress = Some(Array[Byte](10, 0, 0, 1)),
        queryPort = port, queryTimeSec = sec, queryTimeNsec = nsec,
        queryMessage = Some(DnsWire.encode(99, 0, isResponse = false, questions)))))

  test("F1: one row per question, message fields duplicated") {
    val rows = DnstapRows.toQueryRows(
      queryFrame(Seq(DnsWire.Question("a.com.", 1), DnsWire.Question("b.com.", 28))), now)
    assert(rows.map(_.questionName) == Seq("a.com.", "b.com."))
    assert(rows.map(_.questionType) == Seq("A", "AAAA"))
    assert(rows.forall(r => r.identity == "ns1" && r.queryAddress == "10.0.0.1" &&
      r.queryPort == 4242 && r.id == 99 && r.counter == 1L))
  }

  test("P1: event time from sec/nsec; wall-clock fallback when either missing") {
    val withTs = DnstapRows.toQueryRows(queryFrame(Seq(DnsWire.Question("a.", 1))), now).head
    assert(withTs.queryTime.toInstant == Instant.ofEpochSecond(1700000000L, 250000000L))
    val noNsec = DnstapRows.toQueryRows(
      queryFrame(Seq(DnsWire.Question("a.", 1)), nsec = None), now).head
    assert(noNsec.queryTime.toInstant == fixedNow)
  }

  test("P5: missing port defaults to 0") {
    val r = DnstapRows.toQueryRows(
      queryFrame(Seq(DnsWire.Question("a.", 1)), port = None), now).head
    assert(r.queryPort == 0)
  }

  test("Fl1/Fl2: non-MESSAGE frames and non-CLIENT types drop") {
    val f = queryFrame(Seq(DnsWire.Question("a.", 1)))
    assert(DnstapRows.toQueryRows(f.copy(frameType = 2), now).isEmpty)
    val other = f.copy(message = f.message.map(_.copy(msgType = 3))) // RESOLVER_QUERY
    assert(DnstapRows.toQueryRows(other, now).isEmpty)
  }

  test("S4: malformed wire payload drops silently") {
    val f = queryFrame(Seq(DnsWire.Question("a.", 1)))
    val bad = f.copy(message = f.message.map(_.copy(queryMessage = Some(Array[Byte](1, 2)))))
    assert(DnstapRows.toQueryRows(bad, now).isEmpty)
  }

  test("Fl4: NOERROR responses drop unless latency sampling keeps them") {
    val resp = DnstapCodec.Frame(DnstapCodec.TypeMessage, Some("ns1"),
      Some(DnstapCodec.Message(DnstapCodec.ClientResponse,
        queryAddress = Some(Array[Byte](10, 0, 0, 1)),
        responseTimeSec = Some(1700000001L), responseTimeNsec = Some(0),
        responseMessage = Some(DnsWire.encode(99, 0, isResponse = true,
          Seq(DnsWire.Question("a.com.", 1)))))))
    assert(DnstapRows.toResponseRows(resp, keepSuccess = false, now).isEmpty)
    val kept = DnstapRows.toResponseRows(resp, keepSuccess = true, now)
    assert(kept.size == 1 && kept.head.isSuccess && kept.head.responseStatus == "NOERROR")
  }

  test("non-OK response always kept, status rendered") {
    val resp = DnstapCodec.Frame(DnstapCodec.TypeMessage, None,
      Some(DnstapCodec.Message(DnstapCodec.ClientResponse,
        responseMessage = Some(DnsWire.encode(7, 3, isResponse = true,
          Seq(DnsWire.Question("nx.example.", 1)))))))
    val rows = DnstapRows.toResponseRows(resp, keepSuccess = false, now)
    assert(rows.size == 1)
    val r = rows.head
    assert(!r.isSuccess && r.responseStatus == "NXDOMAIN" && r.identity == "")
    assert(r.queryAddress == "<nil>" && r.responseTime.toInstant == fixedNow)
  }
}
