package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class IpRenderSpec extends AnyFunSuite {
  private def v6(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("v4 dotted quad") {
    assert(IpRender.bytes(Array[Byte](192.toByte, 168.toByte, 1, 2)).toString == "192.168.1.2")
    assert(IpRender.bytes(Array[Byte](0, 0, 0, 0)).toString == "0.0.0.0")
    assert(IpRender.bytes(Array[Byte](-1, -1, -1, -1)).toString == "255.255.255.255")
  }

  test("v6 RFC 5952: longest zero run compressed, leftmost on tie") {
    assert(IpRender.bytes(v6("20010db8000000000000000000000001")).toString == "2001:db8::1")
    assert(IpRender.bytes(v6("00000000000000000000000000000001")).toString == "::1")
    assert(IpRender.bytes(v6("00000000000000000000000000000000")).toString == "::")
    // two equal runs (1 group each side) -> single zero group NOT compressed
    assert(IpRender.bytes(v6("20010db8000085a3000085a300000001")).toString ==
      "2001:db8:0:85a3:0:85a3:0:1")
    // longer (second) run wins
    assert(IpRender.bytes(v6("20010000000085a3000000000000b00b")).toString ==
      "2001:0:0:85a3::b00b")
    // true tie between two 2-group runs: leftmost wins
    assert(IpRender.bytes(v6("20010000000085a3000100000000b00b")).toString ==
      "2001::85a3:1:0:0:b00b")
  }

  test("v4-mapped v6 renders as dotted quad (Go net.IP behavior)") {
    assert(IpRender.bytes(v6("00000000000000000000ffffc0a80102")).toString == "192.168.1.2")
  }

  test("other lengths use fallback hex form") {
    assert(IpRender.bytes(Array[Byte](1, 2)).toString == "?0102")
  }

  test("v4 from long matches byte form") {
    assert(IpRender.v4(0xc0a80102L).toString == "192.168.1.2")
  }
}
