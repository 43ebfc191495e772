package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) layout for multi-column data skipping — the public
  * lakehouse technique (Delta/Iceberg `ZORDER BY`): interleave the bits
  * of two sort dimensions so one range-partitioned, range-sorted write
  * clusters BOTH columns at once, and a min/max-pruned scan skips files
  * for predicates on either column.
  *
  * The Morton key is pure integer bit arithmetic (the classic
  * magic-number bit spread), codegen'd Spark column ops end to end —
  * no UDF — and engine-portable: two's-complement `& | <<` produce the
  * same 64-bit pattern in any engine, which is what lets q132 certify
  * the key hash-exactly against DuckDB.
  *
  * Scale shape: `layout` is one `repartitionByRange` shuffle (sampled
  * range boundaries — the same mechanism as any global sort) plus an
  * in-partition sort; the win is at READ time, where per-file min/max
  * z-ranges are disjoint, so a two-dimensional predicate prunes to
  * O(matching) files instead of all of them. */
object ZOrderLayout {

  /** Insert a zero between every low-32 bit (Morton spread). */
  private def spread(c: Column): Column = {
    var x = c.bitwiseAND(lit(0xFFFFFFFFL))
    x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton key of two long columns' low 32 bits (`a` even bits,
    * `b` odd bits). */
  def zValue2(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Cluster `df` for two-column data skipping: range-partition and
    * range-sort by the Morton key of (`colA`, `colB`). Per-partition
    * z-ranges come out disjoint (the range partitioner's contract), so
    * a parquet write of the result carries tight min/max footers on
    * BOTH dimensions. */
  def layout(df: DataFrame, colA: String, colB: String,
             numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1")
    df.withColumn("__z", zValue2(col(colA).cast("long"), col(colB).cast("long")))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
