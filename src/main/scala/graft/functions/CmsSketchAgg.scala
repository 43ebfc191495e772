package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch as a NATIVE Catalyst aggregate — the custom-
  * aggregate tier of the extension ladder (the scalar tier is
  * `CosineSimilarity` et al.), for the sketch shape the DataFrame-
  * level [[graft.operators.HeavyHitters]] pipeline cannot express as
  * one operator: `GROUP BY src` producing ONE binary sketch VALUE per
  * group, mergeable later by [[CmsMergeAgg]] without touching the
  * stream again (the `hll_sketch_agg`/`hll_union_agg` pairing, but
  * with EXACT integer cells — CMS grids are deterministic counts, so
  * unlike HLL images they are engine-portable and replay-stable).
  *
  * Wire format (self-describing, LITTLE-endian): int depth, int
  * width, then depth·width long cells. Cell hashing is BIT-IDENTICAL
  * to the DataFrame path's `xxhash64(lit(i), col)` (same XXH64 chain,
  * seed 42), pinned by CmsSketchSpec against
  * [[graft.operators.HeavyHitters.cmsCells]] — a sketch built by
  * either path merges with the other's. */
object CmsSketch {

  val MaxCells: Int = 1 << 20

  /** The item's one-time 64-bit hash, == `xxhash64(s)` (seed 42). The
    * r19 hash-once layout: the item's bytes are hashed once per
    * occurrence and each depth combines two LONGS, mirroring the
    * DataFrame path's pre-hashed `__ih` column exactly. */
  def itemHash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** The (depth i, itemHash) cell,
    * == `pmod(xxhash64(lit(i), itemHash), width)`. */
  def cellOfHash(i: Int, th: Long, width: Int): Int = {
    val h = XXH64.hashLong(th, XXH64.hashInt(i, 42L))
    val m = (h % width).toInt
    if (m < 0) m + width else m
  }

  def serialize(depth: Int, width: Int, cells: Array[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + cells.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(depth).putInt(width)
    cells.foreach(buf.putLong)
    buf.array()
  }

  /** (depth, width, cells); loud failure on a malformed image. */
  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    require(bytes.length >= 8, s"CMS image too short: ${bytes.length}")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val d = buf.getInt
    val w = buf.getInt
    require(d >= 1 && w >= 1 && d.toLong * w <= MaxCells &&
      bytes.length == 8 + d * w * 8,
      s"malformed CMS image: d=$d w=$w len=${bytes.length}")
    val cells = new Array[Long](d * w)
    var i = 0
    while (i < cells.length) { cells(i) = buf.getLong; i += 1 }
    (d, w, cells)
  }

  // Per-thread memo of the last image parsed, keyed by ARRAY IDENTITY:
  // a probe scan evaluates cms_estimate once per row against the same
  // literal/broadcast image object, and re-deserializing a d·w grid
  // per row is pure GC churn. Identity (eq), not equality — a new
  // array is a new image, and the memo holds exactly one entry.
  private val lastParsed =
    new ThreadLocal[(Array[Byte], Int, Int, Array[Long])]

  /** CMS point estimate from a serialized sketch: min over its d rows.
    * Called from generated code ([[CmsEstimate]]). */
  def estimate(image: Array[Byte], item: UTF8String): Long = {
    val memo = lastParsed.get()
    val (d, w, cells) =
      if (memo != null && (memo._1 eq image)) (memo._2, memo._3, memo._4)
      else {
        val parsed = deserialize(image)
        lastParsed.set((image, parsed._1, parsed._2, parsed._3))
        parsed
      }
    var best = Long.MaxValue
    val th = itemHash(item)
    var i = 0
    while (i < d) {
      val c = cells(i * w + cellOfHash(i, th, w))
      if (c < best) best = c
      i += 1
    }
    best
  }
}

/** `cms_sketch_agg(item, depth, width)` — aggregate a string column
  * into one serialized d×w CMS grid. */
case class CmsSketchAgg(child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && width >= 1 &&
    depth.toLong * width <= CmsSketch.MaxCells,
    s"cms_sketch_agg grid d=$depth w=$width exceeds ${CmsSketch.MaxCells}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val th = CmsSketch.itemHash(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < depth) {
        buf(i * width + CmsSketch.cellOfHash(i, th, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    CmsSketch.serialize(depth, width, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CmsSketch.serialize(depth, width, buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val (d, w, cells) = CmsSketch.deserialize(bytes)
    require(d == depth && w == width,
      s"CMS buffer shape drift: got ${d}x$w, expected ${depth}x$width")
    cells
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsSketchAgg =
    copy(child = c)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_sketch_agg"
}

/** `cms_merge_agg(sketch)` — merge serialized CMS partials by cell
  * addition (shapes must agree; a mismatch is corrupt input and fails
  * loudly rather than merging garbage). */
case class CmsMergeAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def add(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val (da, wa, ca) = CmsSketch.deserialize(a)
      val (db, wb, cb) = CmsSketch.deserialize(b)
      require(da == db && wa == wb,
        s"cannot merge CMS shapes ${da}x$wa and ${db}x$wb")
      var i = 0
      while (i < ca.length) { ca(i) += cb(i); i += 1 }
      CmsSketch.serialize(da, wa, ca)
    }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    add(buf, other)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsMergeAgg =
    copy(child = c)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_merge_agg"
}

/** `cms_estimate(sketch, item)` — scalar point estimate against a
  * serialized sketch (self-describing header, so no shape params).
  * Codegen'd: one static call, no boxing beyond the image bytes. */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cms_estimate requires (BINARY sketch, STRING item), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def nullSafeEval(sketch: Any, item: Any): Any =
    CmsSketch.estimate(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, t) =>
      s"graft.functions.CmsSketch.estimate($s, $t)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmsEstimate = copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}

/** DataFrame-facing column builders. */
object CmsFunctions {
  def cms_sketch_agg(item: Column, depth: Int, width: Int): Column =
    Bridge.column(CmsSketchAgg(Bridge.expression(item), depth, width)
      .toAggregateExpression())
  def cms_merge_agg(sketch: Column): Column =
    Bridge.column(CmsMergeAgg(Bridge.expression(sketch))
      .toAggregateExpression())
  def cms_estimate(sketch: Column, item: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch),
      Bridge.expression(item)))
}
