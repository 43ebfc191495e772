package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static vector kernels, called from generated code: tight primitive loops
  * over Tungsten ArrayData (no boxing, no per-element Catalyst eval). All
  * accumulation is double, strictly left-to-right — bit-reproducible and
  * mirrored exactly by the DuckDB `list_reduce` oracle formulation.
  */
object VectorOps {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
}

/** Cosine similarity of two ARRAY<FLOAT> columns — a codegen'd native
  * Catalyst expression (SURVEY build plan: custom Expression beats UDF):
  * stays inside WholeStageCodegen, one fused loop per row pair. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  private def ok(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

object VectorFunctions {
  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Sign-bit LSH bucket from the first `bits` dimensions — the coarse
    * quantizer for bucketed ANN (hyperplane LSH with axis-aligned planes).
    * Deterministic and exactly reproducible in SQL. */
  def signBucket(e: Column, bits: Int = 6): Column =
    (0 until bits).map(i =>
      when(element_at(e, i + 1) > lit(0f), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
}
