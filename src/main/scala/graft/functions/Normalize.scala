package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFKC/NFD/NFKD) as a codegen'd unary
  * expression — the [[TopTokenCount]] pattern: one virtual call per row
  * into [[compute]], no UDF boundary, stays inside WholeStageCodegen.
  *
  * Why it matters for curation: the dedup family canonicalizes
  * whitespace/case but compares RAW code points, so a corpus mixing
  * composed (U+00E9) and decomposed (U+0065 U+0301) encodings of the
  * same text under-dedups — every hash (fingerprint, shingle, MinHash,
  * SimHash) sees two different strings. The documented canonicalization
  * order is: normalize (this expression) → tokenize → shingle/hash.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (quick-check
  * properties); for ASCII-dominant corpora almost every row skips the
  * rebuild and returns the input buffer unchanged.
  */
case class NormalizeText(child: Expression, form: String)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (!NormalizeText.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"normalize form must be one of ${NormalizeText.Forms.mkString("/")}, got $form")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"normalize requires STRING input, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  /** Public so generated code can call it. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, normForm)) s
    else UTF8String.fromString(Normalizer.normalize(str, normForm))
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normalizeText", this,
      classOf[NormalizeText].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  val Forms: Set[String] = Set("NFC", "NFKC", "NFD", "NFKD")
}

object Normalize {
  /** Unicode-normalize a string column; `form` in NFC/NFKC/NFD/NFKD. */
  def normalize(c: Column, form: String = "NFC"): Column =
    Bridge.column(NormalizeText(Bridge.expression(c), form))
}
