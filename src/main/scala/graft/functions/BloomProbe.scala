package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a BIGINT column — the
  * runtime-filter building block: a compact sketch of a SMALL relation's
  * join keys rides the plan as an expression literal and prunes the BIG
  * relation at its scan, before anything shuffles. False positives only
  * let through rows the downstream exact join discards anyway, so the
  * probe is semantics-preserving wherever it is applied to a join input.
  *
  * The sketch is carried as its serialized bytes (the stable wire format
  * of `BloomFilter.writeTo`) and reconstructed once per deserialized
  * expression instance; the probe itself stays inside WholeStageCodegen —
  * no UDF boundary, one virtual call per row into [[probe]].
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_long requires BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_long"

  /** Entry point for both eval paths; public so generated code can call it. */
  def probe(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any): Any = probe(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression (serializable via bloomBytes); the lazy
    // bloom deserializes once per executor instance, not per row
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainLong].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)

  // case-class equality on an Array field is REFERENCE equality, which
  // breaks the equals/hashCode contract Catalyst relies on for
  // semanticEquals / common-subexpression elimination / exchange reuse:
  // two probes built from the same sketch bytes must compare equal.
  override def equals(other: Any): Boolean = other match {
    case BloomMightContainLong(c, b) =>
      c == child && java.util.Arrays.equals(b, bloomBytes)
    case _ => false
  }
  // cached: Catalyst calls hashCode repeatedly during analysis
  // (ExpressionSet / canonicalization / CSE) and the sketch can be
  // megabytes — never rewalk it per call
  @transient private lazy val bytesHash = java.util.Arrays.hashCode(bloomBytes)
  override def hashCode(): Int = 31 * child.hashCode() + bytesHash
}

object BloomProbe {
  /** Serialize a built filter once for embedding into expressions. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }

  def mightContainLong(c: Column, bloom: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(c), serialize(bloom)))
}
