package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

class StatsReporterSpec extends AnyFunSuite {
  test("cadence grows by half per tick and caps at 4 hours (main.go:155-164)") {
    val s = StatsReporter.Schedule()
    val seq = Iterator.iterate(10L)(s.next).take(30).toSeq
    assert(seq.take(5) == Seq(10L, 15L, 22L, 33L, 49L))
    assert(seq.last == 4L * 3600)          // capped
    assert(s.next(4L * 3600) == 4L * 3600) // stays capped
    assert(seq.sliding(2).forall(p => p(1) >= p(0))) // monotone
  }
}
