package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd max token multiplicity over an array<string> column — the
  * O(n) replacement for the higher-order-function form
  * `aggregate(array_distinct(tk), 0, (acc, u) -> greatest(acc,
  * size(filter(tk, x -> x = u))))`, which is O(distinct·n) = quadratic
  * PER DOCUMENT (a 10k-token page pays ~10⁷ comparisons per row). One
  * hash-map pass per row; stays inside WholeStageCodegen — no UDF
  * boundary, one virtual call per row into [[compute]].
  *
  * Feeds the repetition metrics (`TextAnalysis.topTokenFraction`) and
  * the q100 quality gate; the SQL oracle keeps the O(d·n) list form —
  * tractable at oracle scale and bit-identical in result.
  */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_token_count requires ARRAY<STRING> input, got ${other.sql}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_token_count"

  /** Entry point for both eval paths; public so generated code can call
    * it. Null elements count like any other key (tokens() never emits
    * them, but the expression must not NPE on arbitrary arrays). */
  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Int](
      Math.toIntExact(Math.min(n.toLong * 2, 1L << 16)))
    var max = 0
    var i = 0
    while (i < n) {
      val t = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val c = counts.getOrDefault(t, 0) + 1
      counts.put(t, c)
      if (c > max) max = c
      i += 1
    }
    max
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topTokenCount", this,
      classOf[TopTokenCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

object TokenStats {
  /** Max multiplicity of any element of an array<string> column. */
  def topTokenCount(tk: Column): Column =
    Bridge.column(TopTokenCount(Bridge.expression(tk)))
}
