package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Everything here is RNG-free: membership is a pure function of a
  * portable content hash ([[Dedup.baseHash32]] — first 8 hex chars of
  * md5), so samples are identical under task retry, micro-batch replay,
  * AQE re-planning, and across engines (the DuckDB oracle reproduces the
  * exact row set — something `rand()`-based sampling can never certify).
  * The predicate is a codegen'd column expression evaluated at the scan,
  * so at 100 TB the sample never materializes the rejected rows past the
  * filter.
  */
object Sampling {

  /** Membership predicate: hash(id) mod denom < num. */
  def hashSamplePredicate(id: Column, num: Int, denom: Int = 100): Column =
    pmod(Dedup.baseHash32(id.cast("string")), lit(denom)) < lit(num)

  /** Keep ~num/denom of rows, chosen by id hash. */
  def hashSample(df: DataFrame, idCol: String, num: Int,
                 denom: Int = 100): DataFrame =
    df.filter(hashSamplePredicate(col(idCol), num, denom))

  /** Deterministic per-group cap: keep at most `n` rows per group,
    * chosen by hash order (not arrival order, which is
    * partitioning-dependent) — the "at most N documents per domain /
    * source / language" balancing step of a training-data mix. One
    * shuffle on the group key; the hash rank makes the kept set a pure
    * function of the data, so replay/retry/engine all agree (the DuckDB
    * oracle reproduces it row-for-row). Ties are impossible: the rank
    * order is (hash, id), and ids are unique. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
                  n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(Dedup.baseHash32(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Stratified variant: per-stratum keep rates (percent), e.g. keep 50%
    * of English but 100% of low-resource languages — the standard
    * training-mix rebalance. Unlisted strata fall back to `defaultPct`.
    * One scan, no shuffle: the stratum column and the hash predicate
    * compose into a single filter. */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           pctByStratum: Map[String, Int],
                           defaultPct: Int): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (stratum, p)) =>
        when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(pmod(Dedup.baseHash32(col(idCol).cast("string")), lit(100)) < pct)
  }
}
