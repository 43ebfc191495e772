package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Codegen'd EXACT membership probe over a BIGINT column against a
  * sorted literal long array — the zero-false-positive sibling of
  * [[BloomMightContainLong]] for sets small enough to ship whole
  * (binary search per row, array sorted once at construction). Where
  * the Bloom probe is a prefilter ahead of an exact join, this IS the
  * membership answer, which makes it usable where no downstream join
  * can clean up false positives — notably stateless stream-side
  * filtering ([[graft.streaming.StreamScrub]]), where a Bloom FP would
  * wrongly drop a clean document with nothing downstream to restore it.
  *
  * The array rides the serialized expression (one copy per stage's task
  * broadcast, not per row); 2^22 longs = 32 MiB is the practical ceiling
  * — the same bound `Scrub.decontaminate` enforces for its broadcast.
  */
case class SortedLongSetContains(child: Expression, sorted: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_set_contains requires BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_set_contains"

  /** Entry point for both eval paths; public so generated code can call it. */
  def probe(v: Long): Boolean =
    java.util.Arrays.binarySearch(sorted, v) >= 0

  override protected def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("setProbe", this,
      classOf[SortedLongSetContains].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): SortedLongSetContains =
    copy(child = newChild)

  // array fields default to reference equality — restore the value
  // semantics Catalyst's semanticEquals/CSE machinery relies on (the
  // BloomMightContainLong lesson)
  override def equals(other: Any): Boolean = other match {
    case SortedLongSetContains(c, s) =>
      c == child && java.util.Arrays.equals(s, sorted)
    case _ => false
  }
  @transient private lazy val arrHash = java.util.Arrays.hashCode(sorted)
  override def hashCode(): Int = 31 * child.hashCode() + arrHash
}

object SetProbe {
  /** Exact membership of `c` in `values` (sorted + deduped here once). */
  def containsLong(c: Column, values: Array[Long]): Column = {
    val sorted = values.distinct.sorted
    Bridge.column(SortedLongSetContains(Bridge.expression(c), sorted))
  }
}
