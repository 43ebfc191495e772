package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Deterministic integer logarithm ≈ floor(2²⁰·log2 n) — the
  * cross-engine primitive behind every hash-exact information-theoretic
  * card (entropy, KL drift, tf-idf, DSIR importance): libm `ln`/`log2`
  * may differ between engines in the last ulp, which flips
  * floor(K·log x) at floor boundaries, so any score built on a float
  * log can never be oracle-compared. This one never touches a float:
  * the integer part is the bit length minus one; twenty fraction bits
  * come from the classic square-and-compare iteration on a 30-bit
  * truncating fixed-point mantissa (x ∈ [2³⁰, 2³¹) keeps x² < 2⁶² —
  * no overflow). The value is defined BY the iteration (measured: it
  * sits within 1 micro-unit below the true floor over 2×10⁵ samples)
  * and replays bit-identically on any engine with 64-bit integers —
  * DuckDB oracles run the same 20 steps in a recursive CTE.
  */
object IntLog {

  /** Fraction bits of the fixed-point result (log2 units × 2²⁰). */
  val FracBits: Int = 20

  /** floor-ish(2²⁰·log2 n) for n ≥ 1; throws (loud-guard discipline)
    * below 1 — a count of 0 must be smoothed by the CALLER (the +1 of
    * add-one smoothing), not silently absorbed here. */
  def ilog2Micro(n: Long): Long = {
    if (n < 1L)
      throw new IllegalArgumentException(s"ilog2Micro needs n >= 1, got $n")
    val ip = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x = if (ip <= 30) n << (30 - ip) else n >> (ip - 30)
    var acc = 0L
    var i = 0
    while (i < 20) {
      x = (x * x) >> 30
      if (x >= (1L << 31)) { x >>= 1; acc = (acc << 1) | 1L }
      else acc <<= 1
      i += 1
    }
    (ip.toLong << 20) + acc
  }
}

/** `ilog2_micro(n)` as a codegen'd scalar — a native Catalyst
  * expression (not a UDF) so entropy/KL/tf-idf aggregates like
  * `sum(c * ilog2_micro(c))` stay inside WholeStageCodegen with no
  * serialization boundary per row. */
case class Ilog2MicroExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ilog2_micro requires BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ilog2_micro"
  override protected def nullSafeEval(v: Any): Any =
    IntLog.ilog2Micro(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IntLog.ilog2Micro($c)")
  override protected def withNewChildInternal(newChild: Expression): Ilog2MicroExpr =
    copy(child = newChild)
}

object IntLogFunctions {
  /** Column form of [[IntLog.ilog2Micro]]; input must already be LONG. */
  def ilog2_micro(c: Column): Column =
    Bridge.column(Ilog2MicroExpr(Bridge.expression(c)))
}
