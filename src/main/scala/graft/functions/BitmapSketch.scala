package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Fixed-domain bitmap distinct counting — the EXACT member of the
  * engine's mergeable-summary family (HLL estimates, this counts): one bit
  * per possible id, so COUNT(DISTINCT) becomes a map-side-combined
  * bitwise-OR tree with a popcount at the end. This is the Redshift-genre
  * "bitmap index distinct" / ClickHouse `groupBitmap` shape, and the
  * standard trick for dictionary-encoded ids (user ids, product ids) where
  * the domain is known and dense.
  *
  * Why it scales: the buffer is `ceil(maxId/64)` longs — independent of
  * row count — and merge is elementwise OR, associative + commutative +
  * idempotent, so partial aggregation, AQE re-planning, and any merge
  * topology give bit-identical results (no estimation, no ordering
  * sensitivity; SketchSpec pins merge-topology invariance). A 1M-id
  * domain costs 125 KB per group buffer; sparse/unbounded domains belong
  * to `agg_approx_hll` / `agg_theta_sets` instead — out-of-domain ids
  * FAIL FAST (the id dictionary is a pipeline contract, and silently
  * dropping ids would fake the count).
  */
object BitmapOps {
  /** Largest allocatable dictionary domain (2 MB buffer per group).
    * Callers with a probed domain above this must route to an exact
    * COUNT(DISTINCT) plan or a sketch — see `agg_bitmap_distinct`. */
  val MaxDomain: Int = 1 << 24

  def alloc(maxId: Int): Array[Long] = {
    require(maxId > 0 && maxId <= MaxDomain,
      s"bitmap maxId=$maxId out of range (1 .. $MaxDomain)")
    new Array[Long]((maxId + 63) >>> 6)
  }

  def set(bits: Array[Long], v: Long, maxId: Int): Unit = {
    require(v >= 0 && v < maxId,
      s"bitmap id $v outside declared domain [0, $maxId) — widen maxId or dictionary-encode first")
    bits((v >>> 6).toInt) |= (1L << (v & 63))
  }

  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, s"bitmap width mismatch: ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  def cardinality(bits: Array[Long]): Long = {
    var n = 0L; var i = 0
    while (i < bits.length) { n += java.lang.Long.bitCount(bits(i)); i += 1 }
    n
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bb.asLongBuffer().put(bits)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val lb = java.nio.ByteBuffer.wrap(bytes).asLongBuffer()
    val out = new Array[Long](lb.remaining())
    lb.get(out)
    out
  }
}

/** `bitmap_distinct_agg(id, maxId)` — build a bitmap from raw ids (BINARY out). */
case class BitmapDistinctAgg(
    child: Expression,
    maxId: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_distinct_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = BitmapOps.alloc(maxId)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: Long => BitmapOps.set(buffer, l, maxId)
      case i: Int  => BitmapOps.set(buffer, i.toLong, maxId)
      case other => throw new IllegalArgumentException(
        s"bitmap_distinct_agg expects an integral id, got $other")
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    BitmapOps.or(buffer, other)

  override def eval(buffer: Array[Long]): Any = BitmapOps.toBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = BitmapOps.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinctAgg =
    copy(child = newChild)
}

/** `bitmap_merge_agg(bitmap)` — OR serialized bitmaps (rollup leg). */
case class BitmapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  // width is discovered from the first sketch seen (0-length = empty).
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def orGrow(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b.clone()
    else if (b.isEmpty) a
    else BitmapOps.or(a, b)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else orGrow(buffer, BitmapOps.fromBytes(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    orGrow(buffer, other)

  override def eval(buffer: Array[Long]): Any = BitmapOps.toBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = BitmapOps.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BitmapOps.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapMergeAgg =
    copy(child = newChild)
}

/** `bitmap_count(bitmap)` — popcount of a serialized bitmap (LONG out). */
case class BitmapCount(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bitmap_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    BitmapOps.cardinality(BitmapOps.fromBytes(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression): BitmapCount =
    copy(child = newChild)
}
