package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The pipeline number-of-record fallback convention (r18, VERDICT #1):
  * when a chase exhausts its trials without top-2 agreement, the bench
  * publishes the newest MEASURED agreeing journal line — never a
  * non-reproducing best, never a line that was itself carried. */
class BenchJournalSpec extends AnyFunSuite {

  private def journal(lines: String*): String = {
    val f = Files.createTempFile("bench_journal", ".jsonl")
    Files.write(f, lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    f.toString
  }

  private def pipeLine(rps: Int, agree: Boolean, carried: Boolean = false) =
    s"""{"detail":"pipeline","rows_per_sec":$rps,"frames":4000000,""" +
      s""""secs":14.2,"query_agg_rows":10,"response_agg_rows":10,""" +
      s""""batches":3,"trials":3,"top2_within_15pct":$agree""" +
      (if (carried) ""","carried_from_journal":true}""" else "}")

  test("newest agreeing line wins; non-agreeing and carried lines are " +
    "never the fallback") {
    val p = journal(
      pipeLine(281510, agree = true),
      pipeLine(253245, agree = true),
      pipeLine(347150, agree = false), // spread-flagged best: excluded
      pipeLine(299999, agree = false, carried = true)) // echo: excluded
    val got = BenchJournal.newestAgreeingPipeline(p)
    assert(got.map(_.rowsPerSec) === Some(253245.0),
      "fallback must be the NEWEST measured agreeing line")
    assert(got.map(_.frames) === Some(4000000L))
    assert(got.map(_.secs) === Some(14.2))
  }

  test("carried lines marked agreeing are still excluded (the no-echo " +
    "rule keys on provenance, not the agreement flag)") {
    val p = journal(
      pipeLine(100000, agree = true),
      s"""{"detail":"pipeline","rows_per_sec":999999,"frames":1,""" +
        s""""secs":1.0,"trials":6,"top2_within_15pct":true,""" +
        s""""carried_from_journal":true}""")
    assert(BenchJournal.newestAgreeingPipeline(p)
      .map(_.rowsPerSec) === Some(100000.0))
  }

  test("no journal, empty path, no agreeing line, or garbage content " +
    "mean NO fallback — never a throw") {
    assert(BenchJournal.newestAgreeingPipeline("") === None)
    assert(BenchJournal.newestAgreeingPipeline(
      "/nonexistent/bench.jsonl") === None)
    assert(BenchJournal.newestAgreeingPipeline(
      journal(pipeLine(5, agree = false))) === None)
    assert(BenchJournal.newestAgreeingPipeline(
      journal("not json at all", """{"detail":"queries"}""")) === None)
    // a directory path is unreadable as a file: swallowed, None
    val dir = Files.createTempDirectory("bench_journal_dir").toString
    assert(BenchJournal.newestAgreeingPipeline(dir) === None)
    Files.deleteIfExists(Paths.get(dir))
  }
}
