package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `outer_acc_agg(array<long>)` — exact Gram/scatter-matrix accumulation:
  * sums the upper triangle of v·vᵀ (plus the count) over quantized-long
  * vectors. This is the distributed primitive under PCA / covariance /
  * whitening: each partition folds its rows into ONE d(d+1)/2-long buffer
  * (O(1) in row count), partials merge by elementwise ADD in any topology,
  * and the driver receives a single d×d matrix no matter how many rows
  * were scanned — the same mergeable-partial shape as the engine's
  * sketches, but exact. Long arithmetic makes the result bit-identical
  * across partitionings (integer addition is associative), which is what
  * lets PcaSpec pin repartition-invariance.
  *
  * Overflow budget: with |q| ≤ Q the accumulated magnitude is n·Q²; the
  * caller picks the quantization scale so n·Q² < 2⁶³ (the catalog entry
  * uses Q ≈ 3·10⁴ at n ≤ 10⁶; a 100-TB run re-scales per shard or rolls
  * up per-partition DOUBLE Grams instead — documented at the entry).
  *
  * Buffer layout: [d, count, tri(0,0), tri(0,1) … tri(d-1,d-1)] — row-major
  * upper triangle. Width is discovered from the first vector seen.
  */
case class OuterProductAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "outer_acc_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def alloc(d: Int): Array[Long] = {
    val buf = new Array[Long](2 + d * (d + 1) / 2)
    buf(0) = d
    buf
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val buf = if (buffer.isEmpty) alloc(d) else buffer
    require(buf(0) == d, s"outer_acc_agg: vector length $d != ${buf(0)}")
    buf(1) += 1
    var i = 0
    var k = 2
    while (i < d) {
      val vi = arr.getLong(i)
      var j = i
      while (j < d) {
        buf(k) += vi * arr.getLong(j)
        k += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (buffer.isEmpty) other
    else if (other.isEmpty) buffer
    else {
      require(buffer(0) == other(0),
        s"outer_acc_agg: dimension mismatch ${buffer(0)} vs ${other(0)}")
      var i = 1
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Long]): Any = longsToBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = longsToBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = bytesToLongs(bytes)

  private def longsToBytes(ls: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(ls.length * 8)
    bb.asLongBuffer().put(ls)
    bb.array()
  }

  private def bytesToLongs(bytes: Array[Byte]): Array[Long] = {
    val lb = java.nio.ByteBuffer.wrap(bytes).asLongBuffer()
    val out = new Array[Long](lb.remaining())
    lb.get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): OuterProductAgg =
    copy(child = newChild)
}

object OuterProductAgg {
  /** Decode an eval()/serialize() payload back to (d, n, upper-triangle). */
  def decode(bytes: Array[Byte]): (Int, Long, Array[Long]) = {
    val lb = java.nio.ByteBuffer.wrap(bytes).asLongBuffer()
    val all = new Array[Long](lb.remaining())
    lb.get(all)
    require(all.nonEmpty, "empty outer_acc_agg payload (no rows aggregated)")
    (all(0).toInt, all(1), all.drop(2))
  }

  /** Expand the packed upper triangle into a full symmetric d×d matrix. */
  def toMatrix(d: Int, tri: Array[Long]): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        m(i)(j) = tri(k).toDouble
        m(j)(i) = tri(k).toDouble
        k += 1
        j += 1
      }
      i += 1
    }
    m
  }
}
