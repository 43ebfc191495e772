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

  /** A FRESH session on an existing SparkContext with `configure`'s
    * extensions actually applied. `builder().getOrCreate()` cannot do
    * this: when the context already exists it resolves
    * `spark.sql.extensions` from the CONTEXT's conf (builder options for
    * static confs are silently ignored), so a test/JVM that got its
    * context from an earlier plain session could never obtain an
    * extensions-carrying session. The classic constructor is
    * `private[sql]`, hence this lives in the shim. */
  def sessionWithExtensions(
      sc: org.apache.spark.SparkContext,
      configure: org.apache.spark.sql.SparkSessionExtensions => Unit,
      options: Map[String, String]): org.apache.spark.sql.SparkSession = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    configure(ext)
    // the 6-arg constructor is Scala-private to a narrower scope than
    // this package but public in bytecode — plain Java reflection
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession]
      .getConstructor(classOf[org.apache.spark.SparkContext],
        classOf[Option[_]], classOf[Option[_]],
        classOf[org.apache.spark.sql.SparkSessionExtensions],
        classOf[Map[_, _]], classOf[Map[_, _]])
    ctor.newInstance(sc, None, None, ext, options,
      Map.empty[String, String])
  }
}
