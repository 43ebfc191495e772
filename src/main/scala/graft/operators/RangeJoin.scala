package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval RANGE JOIN without a nested loop.
  *
  * Spark has no native range-join strategy: `p.t BETWEEN i.lo AND i.hi`
  * alone plans a BroadcastNestedLoopJoin (or a cartesian) — the classic
  * 100 TB cliff. The public fix (the binned range join every warehouse
  * engine ships): replicate each interval to every fixed-width BIN it
  * overlaps, hash each point to its single bin, equi-join on
  * (keys..., bin) and keep the exact range predicate as the join
  * residual. Each (point, interval) pair can only meet in the point's
  * bin, so the join emits no duplicates and needs no post-distinct.
  *
  * Cost model: interval replication = ceil(len/binWidth)+1 rows, so
  * pick `binWidth` near the TYPICAL interval length — shuffle stays
  * O(|points| + |intervals| · avg_len/binWidth) and the per-bin probe
  * is hash, not scan. Degenerate skew (every row in one bin) is the
  * caller's signal that the key columns, not the bin, should carry the
  * selectivity.
  */
object RangeJoin {

  /** Interval-overlap join: pair every left interval [lloCol, lhiCol]
    * with every right interval [rloCol, rhiCol] (inclusive, LONG) that
    * overlaps it, under `keys` equality. Same binning as
    * [[pointInInterval]], plus the CANONICAL-BIN rule: an overlapping
    * pair co-occurs in every bin the overlap spans, so it emits only in
    * the overlap's FIRST bin (`floor(max(llo, rlo) / binWidth)`) — no
    * post-join distinct. Returns left.* then right.* minus its keys;
    * right-side range columns surface as `rloCol`/`rhiCol` (names must
    * differ from the left's). */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
                      lloCol: String, lhiCol: String, rloCol: String,
                      rhiCol: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(Set(lloCol, lhiCol).intersect(Set(rloCol, rhiCol)).isEmpty,
      "left and right range column names must differ")
    def bin(c: org.apache.spark.sql.Column) =
      graft.functions.IntMath.floordiv(c, binWidth)
    val lb = left.withColumn("__bin",
      explode(sequence(bin(col(lloCol)), bin(col(lhiCol)))))
    val rb = right.withColumn("__bin",
      explode(sequence(bin(col(rloCol)), bin(col(rhiCol)))))
    val joined = lb.join(rb,
      keys.map(k => lb(k) === rb(k)).reduceOption(_ && _)
        .map(_ && lb("__bin") === rb("__bin"))
        .getOrElse(lb("__bin") === rb("__bin")) &&
        lb(lloCol) <= rb(rhiCol) && rb(rloCol) <= lb(lhiCol) &&
        lb("__bin") === bin(greatest(lb(lloCol), rb(rloCol))))
    val dropRight = keys.map(rb(_)) :+ rb("__bin")
    dropRight.foldLeft(joined)((d, c) => d.drop(c)).drop("__bin")
  }

  /** Inner-join `points` to every interval whose [loCol, hiCol] (both
    * inclusive, LONG-typed — cast timestamps to epoch seconds first)
    * contains `pointCol`, with `keys` as additional equi-join columns
    * present on BOTH sides. Returns points.* then intervals.* (minus
    * its join keys). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], pointCol: String, loCol: String,
                      hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    // exact integer floorDiv: negative epochs must bin consistently on
    // both sides, and the double path would silently mis-bin |v| >= 2^53
    def bin(c: org.apache.spark.sql.Column) =
      graft.functions.IntMath.floordiv(c, binWidth)
    val ib = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val pb = points.withColumn("__bin", bin(col(pointCol)))
    val joined = pb.join(ib,
      keys.map(k => pb(k) === ib(k)).reduceOption(_ && _)
        .map(_ && pb("__bin") === ib("__bin"))
        .getOrElse(pb("__bin") === ib("__bin")) &&
        pb(pointCol) >= ib(loCol) && pb(pointCol) <= ib(hiCol))
    val dropRight = keys.map(ib(_)) :+ ib("__bin")
    dropRight.foldLeft(joined)((d, c) => d.drop(c)).drop("__bin")
  }
}
