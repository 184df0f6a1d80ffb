package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Mergeable point-frequency sketch — Count-Min (Cormode & Muthukrishnan).
  *
  * Completes the engine's mergeable-summary family: HLL (distinct), KLL
  * (quantiles), Misra–Gries (heavy hitters) — CMS answers "how often did
  * THIS key occur" in fixed space. depth×width counters; update adds 1 to
  * one cell per row (per-row hash), estimate takes the MIN over the rows.
  * Estimates NEVER undercount; overcount ≤ εN with ε ≈ e/width at
  * confidence 1−e^(−depth) — the opposite bias of MG's lower bounds, which
  * is why both exist.
  *
  * merge = pointwise counter sum (same dims required) — EXACT, so the
  * merged sketch is bit-identical for every merge-tree shape (Agarwal et
  * al., PODS 2012); SketchSpec pins that invariance. At 100 TB the rollup
  * ships depth×width longs per partition instead of the key space.
  *
  * Determinism: per-row hashing is MurmurHash3 over the key's UTF-8 bytes
  * with the row index as seed — a pure function of (key, row), identical
  * on every JVM and partitioning. No RNG state anywhere. */
final class CountMinSketch(val depth: Int, val width: Int) extends Serializable {
  require(depth >= 1 && width >= 1, s"cms dims ($depth x $width) must be >= 1")

  private[functions] val table: Array[Long] = new Array[Long](depth * width)
  private[functions] var total: Long = 0L

  def n: Long = total

  private def cell(row: Int, key: String): Int = {
    val h = scala.util.hashing.MurmurHash3.bytesHash(
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8), row)
    row * width + java.lang.Math.floorMod(h, width)
  }

  def update(key: String): Unit = {
    total += 1
    var d = 0
    while (d < depth) { table(cell(d, key)) += 1; d += 1 }
  }

  def merge(o: CountMinSketch): Unit = {
    require(o.depth == depth && o.width == width,
      s"cms dims differ: ${depth}x$width vs ${o.depth}x${o.width}")
    var i = 0
    while (i < table.length) { table(i) += o.table(i); i += 1 }
    total += o.total
  }

  /** Point estimate: min over the depth rows — an upper bound on the true
    * count, within εN of it with high probability. */
  def estimate(key: String): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val c = table(cell(d, key))
      if (c < best) best = c
      d += 1
    }
    best
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(depth); out.writeInt(width); out.writeLong(total)
    var i = 0
    while (i < table.length) { out.writeLong(table(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object CountMinSketch {
  def deserialize(bytes: Array[Byte]): CountMinSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new CountMinSketch(in.readInt(), in.readInt())
    sk.total = in.readLong()
    var i = 0
    while (i < sk.table.length) { sk.table(i) = in.readLong(); i += 1 }
    sk
  }
}

/** `cms_sketch_agg(key[, width])` — build a depth-4 CMS from raw STRING
  * keys. Output: serialized sketch (BINARY), mergeable downstream. */
case class CmsSketchAgg(
    child: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  override def prettyName: String = "cms_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CountMinSketch =
    new CountMinSketch(CmsSketchAgg.Depth, width)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: CountMinSketch): Any = buffer.serialize()
  override def serialize(buffer: CountMinSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  /** Depth 4 ⇒ failure probability e^−4 ≈ 1.8% per estimate. */
  val Depth = 4
}

/** `cms_merge_agg(sketch[, width])` — union serialized sketches (rollup /
  * re-aggregation path: pointwise sum, no raw-data rescan). */
case class CmsMergeAgg(
    child: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch] with UnaryLike[Expression] {

  override def prettyName: String = "cms_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): CountMinSketch =
    new CountMinSketch(CmsSketchAgg.Depth, width)

  override def update(buffer: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(CountMinSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: CountMinSketch, other: CountMinSketch): CountMinSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: CountMinSketch): Any = buffer.serialize()
  override def serialize(buffer: CountMinSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** `cms_estimate(sketch, key)` — point-frequency upper bound off a
  * serialized sketch. Scalar, once per output row — CodegenFallback. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sketch: Any, keyAny: Any): Any =
    CountMinSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
      .estimate(keyAny.toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
