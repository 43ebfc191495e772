package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge

/** Exact integer arithmetic columns where the double-valued DSL
  * operators lose precision.
  */
object IntMath {

  /** Floor division on LONG columns with DuckDB `//` semantics: exact
    * for every long (no double round-trip, so |v| > 2^53 stays exact)
    * and floors toward negative infinity (-5 floordiv 10 == -1, where
    * truncating `div` gives 0). Built from Catalyst's IntegralDivide
    * (truncating) minus a 1 when the remainder is negative — both legs
    * codegen'd, no UDF.
    */
  def floordiv(c: Column, d: Long): Column = {
    require(d > 0, s"floordiv divisor must be > 0, got $d")
    val q = Bridge.column(IntegralDivide(Bridge.expression(c.cast("long")),
      Literal(d)))
    val r = c.cast("long") % lit(d)
    (q - when(r < 0, lit(1L)).otherwise(lit(0L))).cast("long")
  }
}
