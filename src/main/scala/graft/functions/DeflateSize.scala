package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** zlib-deflated byte size of a string column — the compressibility
  * quality signal of the C4/RefinedWeb lineage: heavily templated or
  * repeated text compresses far below natural prose, so
  * `deflated/raw` basis points make a cheap, language-agnostic
  * redundancy score that catches repetition the token-level rules
  * (dup-token, top-token, span coverage) miss, e.g. long-range
  * paragraph loops.
  *
  * Codegen'd ([[TopTokenCount]] pattern): one virtual call per row, a
  * fresh Deflater per evaluation (they are not thread-safe and rows are
  * evaluated concurrently across tasks), compressed bytes COUNTED but
  * never materialized. Deterministic for a fixed zlib level and input,
  * but NOT portable across zlib builds — so queries over it are
  * rows-only by design, with value semantics pinned by unit tests, the
  * same contract as the HLL/packing family.
  */
case class DeflateSize(child: Expression, level: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (level < 0 || level > 9)
      TypeCheckResult.TypeCheckFailure(s"deflate level must be 0..9, got $level")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"deflate_size requires STRING input, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_size"

  /** Public so generated code can call it. */
  def compute(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateSize", this,
      classOf[DeflateSize].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object Compressibility {
  /** Deflated size (bytes) of a string column at the given zlib level. */
  def deflateSize(c: Column, level: Int = 6): Column =
    Bridge.column(DeflateSize(Bridge.expression(c), level))
}
