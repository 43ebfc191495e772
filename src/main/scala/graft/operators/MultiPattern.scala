package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern scanning — Aho-Corasick over a broadcast automaton,
  * the shape a blocklist scrub takes once the list outgrows regex
  * alternation (a 10⁶-phrase blocklist compiled into one `(a|b|...)`
  * regex is unusable; the AC automaton scans in O(text + matches)
  * REGARDLESS of pattern count).
  *
  * Scale (100 TB): the automaton is built ONCE driver-side from the
  * pattern relation (bounded collect with a LOUD `require` cap — the
  * broadcast-literal-table discipline of DSIR/PQ), shipped as a
  * broadcast, and each document is one narrow partition-local scan; no
  * join, no shuffle beyond the caller's aggregation. Pattern count
  * changes the automaton size, not the scan cost.
  *
  * Matching semantics (pinned by MultiPatternSpec against a naive
  * position scan): EVERY occurrence counts, overlapping included, per
  * pattern independently — standard Aho-Corasick output semantics.
  * (The q166 oracle counts via SQL `replace`, which is left-to-right
  * non-overlapping — equal exactly when no pattern can overlap itself,
  * which the query's `first-token ≠ last-token` bigram patterns
  * guarantee; the spec covers the self-overlapping general case.)
  */
object MultiPattern {

  val MaxPatterns = 1 << 20

  /** Serializable Aho-Corasick automaton (array-of-hashmaps trie with
    * BFS failure links and output chains). */
  final class Automaton private[MultiPattern] (
      private val next: Array[scala.collection.mutable.HashMap[Char, Int]],
      private val fail: Array[Int],
      private val out: Array[Int],     // pattern id ending at this node, -1
      private val outLink: Array[Int], // next node in the output chain, -1
      val nPatterns: Int) extends Serializable {

    /** Per-pattern occurrence counts in `text` (overlapping included). */
    def scan(text: String): Array[Long] = {
      val counts = new Array[Long](nPatterns)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !next(s).contains(c)) s = fail(s)
        s = next(s).getOrElse(c, 0)
        var t = s
        while (t != -1) {
          if (out(t) >= 0) counts(out(t)) += 1
          t = outLink(t)
        }
        i += 1
      }
      counts
    }
  }

  /** Build the automaton from a pattern list (driver-side, bounded). */
  def buildAutomaton(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.size <= MaxPatterns,
      s"${patterns.size} patterns exceeds the $MaxPatterns automaton cap " +
        "— shard the blocklist or raise the cap deliberately")
    require(patterns.forall(_.nonEmpty), "empty-string pattern")
    val next = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val outBuf = scala.collection.mutable.ArrayBuffer(-1)
    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.foreach { c =>
        s = next(s).getOrElseUpdate(c, {
          next += scala.collection.mutable.HashMap.empty[Char, Int]
          outBuf += -1
          next.size - 1
        })
      }
      outBuf(s) = id // duplicate patterns: last id wins (callers dedupe)
    }
    val n = next.size
    val fail = new Array[Int](n)
    val outLink = Array.fill(n)(-1)
    val queue = scala.collection.mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      next(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        fail(v) = if (next(f).contains(c) && next(f)(c) != v) next(f)(c) else 0
        outLink(v) = if (outBuf(fail(v)) >= 0) fail(v) else outLink(fail(v))
        queue += v
      }
    }
    new Automaton(next.toArray, fail, outBuf.toArray, outLink, patterns.size)
  }

  /** Collect the single-column `patterns` relation (bounded, loud) and
    * scan `textCol`: one row per input row with total occurrence count
    * and the number of distinct patterns hit. */
  def scanCounts(df: DataFrame, idCol: String, textCol: String,
                 patterns: DataFrame): DataFrame = {
    val pats = collectPatterns(patterns)
    val ac = df.sparkSession.sparkContext.broadcast(buildAutomaton(pats))
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val a = ac.value
        it.map { case (id, text) =>
          val c = a.scan(text)
          (id, c.sum, c.count(_ > 0).toLong)
        }
      }
      .toDF(idCol, "n_hits", "n_pats")
  }

  /** Per-pattern hit census: (pattern, n_docs containing it, n_hits
    * total occurrences) — the blocklist-effectiveness report. */
  def patternCensus(df: DataFrame, textCol: String,
                    patterns: DataFrame): DataFrame = {
    val pats = collectPatterns(patterns)
    val ac = df.sparkSession.sparkContext.broadcast(buildAutomaton(pats))
    val patLit = df.sparkSession.sparkContext.broadcast(pats.toArray)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(textCol)).as[String]
      .mapPartitions { it =>
        val a = ac.value
        val names = patLit.value
        it.flatMap { text =>
          val c = a.scan(text)
          c.indices.collect {
            case i if c(i) > 0 => (names(i), 1L, c(i))
          }
        }
      }
      .toDF("pattern", "d", "h")
      .groupBy(col("pattern"))
      .agg(sum(col("d")).as("n_docs"), sum(col("h")).as("n_hits"))
  }

  private def collectPatterns(patterns: DataFrame): Seq[String] = {
    require(patterns.columns.length == 1,
      s"pattern relation must have one column, got ${patterns.columns.toSeq}")
    val rows = patterns.distinct().limit(MaxPatterns + 1).collect()
    require(rows.length <= MaxPatterns,
      s"pattern relation exceeds the $MaxPatterns cap")
    rows.map(_.getString(0)).toSeq.sorted
  }
}
