package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static IP rendering helpers, shared by the Catalyst expressions below
  * (called from generated code) and by the row-level dnstap codec.
  *
  * Reference behavior: `net.IP(bytes).String()`
  * (/root/reference/src/dnstap/dnstap.go:292,355) — dotted quad for 4-byte
  * addresses, RFC 5952 compressed lowercase hex for 16-byte ones (with the
  * v4-mapped ::ffff:a.b.c.d special case), and "?<hex>" is Go's fallback for
  * other lengths (we render "?" + hex to stay deterministic).
  */
object IpRender {

  def v4(v: Long): UTF8String = {
    val sb = new java.lang.StringBuilder(15)
    sb.append((v >>> 24) & 0xff).append('.').append((v >>> 16) & 0xff)
      .append('.').append((v >>> 8) & 0xff).append('.').append(v & 0xff)
    UTF8String.fromString(sb.toString)
  }

  def bytes(b: Array[Byte]): UTF8String = b.length match {
    case 4 =>
      v4(((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
         ((b(2) & 0xffL) << 8) | (b(3) & 0xffL))
    case 16 =>
      // v4-mapped (::ffff:a.b.c.d) renders as dotted quad, like Go net.IP.
      val v4Mapped = (0 until 10).forall(i => b(i) == 0) &&
        (b(10) & 0xff) == 0xff && (b(11) & 0xff) == 0xff
      if (v4Mapped)
        v4(((b(12) & 0xffL) << 24) | ((b(13) & 0xffL) << 16) |
           ((b(14) & 0xffL) << 8) | (b(15) & 0xffL))
      else UTF8String.fromString(v6String(b))
    case _ =>
      val hex = b.map(x => f"${x & 0xff}%02x").mkString
      UTF8String.fromString("?" + hex)
  }

  /** RFC 5952 text form: lowercase hex groups, longest run (>1) of zero
    * groups compressed to "::", leftmost run on ties. */
  private def v6String(b: Array[Byte]): String = {
    val g = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    var bestStart, bestLen, curStart, curLen = 0
    var i = 0
    while (i < 8) {
      if (g(i) == 0) {
        if (curLen == 0) curStart = i
        curLen += 1
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
      } else curLen = 0
      i += 1
    }
    val sb = new java.lang.StringBuilder(39)
    if (bestLen > 1) {
      var j = 0
      while (j < bestStart) {
        if (j > 0) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(j)))
        j += 1
      }
      sb.append("::")
      j = bestStart + bestLen
      while (j < 8) {
        sb.append(java.lang.Integer.toHexString(g(j)))
        if (j < 7) sb.append(':')
        j += 1
      }
    } else {
      var j = 0
      while (j < 8) {
        if (j > 0) sb.append(':')
        sb.append(java.lang.Integer.toHexString(g(j)))
        j += 1
      }
    }
    sb.toString
  }
}

/** Dotted-quad rendering of the low 32 bits of a LONG — codegen'd scalar
  * (P2, SURVEY §2.2): stays inside WholeStageCodegen, no UDF boundary. */
case class Ipv4String(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ipv4_string requires BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ipv4_string"
  override protected def nullSafeEval(v: Any): Any =
    IpRender.v4(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpRender.v4($c)")
  override protected def withNewChildInternal(newChild: Expression): Ipv4String =
    copy(child = newChild)
}

/** Go-net.IP-compatible rendering of a BINARY address (4 or 16 bytes) —
  * codegen'd scalar for the dnstap source path (P2). */
case class IpBytesString(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ip_bytes_string requires BINARY input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ip_bytes_string"
  override protected def nullSafeEval(v: Any): Any =
    IpRender.bytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IpRender.bytes($c)")
  override protected def withNewChildInternal(newChild: Expression): IpBytesString =
    copy(child = newChild)
}

object IpFunctions {
  def ipv4_string(c: Column): Column =
    Bridge.column(Ipv4String(Bridge.expression(c)))
  def ip_bytes_string(c: Column): Column =
    Bridge.column(IpBytesString(Bridge.expression(c)))
}
