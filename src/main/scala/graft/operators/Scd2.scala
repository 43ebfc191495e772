package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval builder — the warehouse
  * primitive that turns a change LOG into validity-interval HISTORY
  * rows ("this was the record's state from version 3 through 6"), the
  * shape every point-in-time-correct feature join reads
  * ([[AsOfMatch.asOfJoin]] against `valid_from` is exactly the
  * leakage-free feature-store join).
  *
  * Two window passes on ONE key exchange:
  *  1. change compression — a log row whose tracked attributes equal
  *     its predecessor's (null-safe) is a no-op redelivery and is
  *     dropped, so storage scales with REAL changes, not log chatter;
  *  2. interval assignment — `valid_from` = the row's version,
  *     `valid_to` = next surviving change's version − 1, null for the
  *     current row (open interval).
  *
  * Determinism: the log is ordered by (key, version); duplicate
  * versions for one key are malformed input and fail loudly rather
  * than picking an arbitrary winner. */
object Scd2 {

  /** Build SCD2 intervals from a change log `(keyCol, versionCol,
    * attrCols...)`. Output: keyCol, valid_from, valid_to (null =
    * current), attrCols. */
  def intervals(changes: DataFrame, keyCol: String, versionCol: String,
                attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "SCD2 needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol))
    val attrs = struct(attrCols.map(col): _*)
    val compressed = changes
      .withColumn("__dupv",
        lag(col(versionCol), 1).over(w) === col(versionCol))
      .withColumn("__same", lag(attrs, 1).over(w) <=> attrs)
      .withColumn("__first", lag(col(versionCol), 1).over(w).isNull)
    // duplicate version detection must run BEFORE compression drops
    // rows — a malformed log is an error, not a silent collapse
    val flagged = compressed.withColumn("__bad",
      max(when(col("__dupv"), 1).otherwise(0))
        .over(Window.partitionBy(col(keyCol))))
    val kept = flagged
      .filter(col("__first") || !col("__same"))
      .withColumn("valid_from", col(versionCol).cast("long"))
      .withColumn("valid_to",
        lead(col(versionCol), 1).over(w).cast("long") - 1L)
    val keyOrFail = when(col("__bad") === 1,
      raise_error(concat(lit("SCD2: duplicate version for key "),
        col(keyCol).cast("string"))))
      .otherwise(col(keyCol)).as(keyCol)
    kept.select(keyOrFail +: col("valid_from") +: col("valid_to") +:
      attrCols.map(col): _*)
  }

  /** Point-in-time read against [[intervals]] output — THE reason the
    * history rows exist: each fact row `(keyCol, asOfCol)` picks the
    * interval containing its version (`valid_from ≤ asof ≤ valid_to`,
    * open current interval included), i.e. the record's state as the
    * fact saw it — the leakage-free feature-store join.
    *
    * Scale: an EQUI join on the key with the containment as residual —
    * each key holds its own (few) history rows, so the residual scans
    * a per-key handful, never a banded replication (keys are the
    * partitioning; compare the keyless range joins q131/q134, which
    * need [[RangeJoin]]'s bins precisely because they lack this key).
    *
    * @return fact columns + the interval's attrCols */
  def pointInTime(history: DataFrame, keyCol: String,
                  facts: DataFrame, asOfCol: String,
                  attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "pointInTime needs at least one attribute")
    val h = history.select(
      col(keyCol) +: col("valid_from") +: col("valid_to") +:
        attrCols.map(col): _*)
    facts.join(h, Seq(keyCol))
      .filter(col("valid_from") <= col(asOfCol) &&
        (col("valid_to").isNull || col(asOfCol) <= col("valid_to")))
      .drop("valid_from", "valid_to")
  }
}
