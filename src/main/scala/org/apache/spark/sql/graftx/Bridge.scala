package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal interop shim: Spark 4 made Expression↔Column conversion
  * `private[sql]` (columnNodeSupport.scala), so the one place that needs it
  * lives under the org.apache.spark.sql namespace. Everything else in this
  * project stays in `graft.*`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
