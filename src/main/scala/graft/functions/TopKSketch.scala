package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters (approx top-k) sketch — Misra–Gries summary.
  *
  * The frequent-items analog of the engine's HLL and KLL entries: build one
  * small counter table per partition / per fine group, merge the tables up
  * the rollup tree without rescanning data, and read the top keys off the
  * merged summary. At 100 TB this is THE way to get "top URLs / tokens /
  * error codes" — a full groupBy on a high-cardinality key shuffles the
  * whole key space; the sketch shuffles `capacity` counters per partition.
  *
  * Semantics (classic Misra–Gries, deterministic — no hashing, no random):
  *  - update(key): counted if present; inserted if a slot is free; else
  *    EVERY counter decrements by 1 (zeros evicted). Estimates are LOWER
  *    bounds; undercount ≤ n/(capacity+1).
  *  - merge: pointwise counter sum, then if over capacity subtract the
  *    (capacity+1)-th largest count from all and drop non-positives
  *    (Agarwal et al., "Mergeable Summaries", PODS 2012) — the combined
  *    undercount bound (n₁+n₂)/(capacity+1) is preserved under ANY merge
  *    tree shape.
  *  - EXACT REGIME: while the number of distinct keys seen never exceeds
  *    `capacity` (in every partial and in every merge), no decrement ever
  *    fires and counts are exact — that makes the catalog entry
  *    oracle-checkable against plain GROUP BY + ROW_NUMBER.
  *
  * Update is O(1) amortized except the decrement-all miss path, which is
  * O(capacity); with the intended capacities (≤ a few hundred) that is a
  * cache-resident array sweep, far cheaper than the shuffle it replaces.
  */
final class TopKSketch(val capacity: Int) extends Serializable {
  require(capacity >= 1, s"topk capacity=$capacity must be >= 1")

  import scala.collection.mutable
  private[functions] val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  private[functions] var total: Long = 0L

  def n: Long = total

  def update(key: String): Unit = {
    total += 1
    counts.get(key) match {
      case Some(c) => counts.update(key, c + 1)
      case None if counts.size < capacity => counts.update(key, 1L)
      case None =>
        // MG decrement-all: every counter pays 1; zeros free their slots
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (_, c) => c - 1 }
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }
  }

  def merge(o: TopKSketch): Unit = {
    o.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    total += o.total
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val m = sorted(sorted.length - (capacity + 1))
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace { (_, c) => c - m }
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
  }

  /** Top-k entries by (count desc, key asc) — the total order makes the
    * extract deterministic under ties. */
  def top(k: Int): Seq[(String, Long)] =
    counts.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  /** Estimated (lower-bound) count for a tracked key; None if evicted. */
  def estimate(key: String): Option[Long] = counts.get(key)

  /** Snapshot of all tracked counters (test/diagnostic surface). */
  def entries: Map[String, Long] = counts.toMap

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeLong(total)
    out.writeInt(counts.size)
    // keys as length-prefixed raw UTF-8 (writeUTF throws past 64 KiB — an
    // aggregation over long keys, e.g. document text, must degrade to a
    // bigger buffer, not crash at partial serialization)
    counts.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }
}

object TopKSketch {
  def deserialize(bytes: Array[Byte]): TopKSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new TopKSketch(in.readInt())
    sk.total = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      sk.counts.update(
        new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    sk
  }
}

/** `topk_sketch_agg(key[, capacity])` — build a summary from raw STRING
  * keys. Output: the serialized summary (BINARY), mergeable downstream. */
case class TopKSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSketch] with UnaryLike[Expression] {

  override def prettyName: String = "topk_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKSketch = new TopKSketch(capacity)

  override def update(buffer: TopKSketch, input: InternalRow): TopKSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: TopKSketch, other: TopKSketch): TopKSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: TopKSketch): Any = buffer.serialize()
  override def serialize(buffer: TopKSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TopKSketch = TopKSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKSketchAgg =
    copy(child = newChild)
}

/** `topk_merge_agg(sketch[, capacity])` — union serialized summaries (the
  * rollup / re-aggregation path: no raw-data rescan). */
case class TopKMergeAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKSketch] with UnaryLike[Expression] {

  override def prettyName: String = "topk_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKSketch = new TopKSketch(capacity)

  override def update(buffer: TopKSketch, input: InternalRow): TopKSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(TopKSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: TopKSketch, other: TopKSketch): TopKSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: TopKSketch): Any = buffer.serialize()
  override def serialize(buffer: TopKSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): TopKSketch = TopKSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKMergeAgg =
    copy(child = newChild)
}

/** `topk_extract(sketch, k)` — read the top-k entries off a serialized
  * summary as array<struct<key string, cnt bigint>>, ordered by
  * (cnt desc, key asc). Scalar, runs once per group row — CodegenFallback
  * is fine. */
case class TopKExtract(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "topk_extract"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(sketch: Any, kAny: Any): Any = {
    val sk = TopKSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
    val k = kAny match {
      case i: Int => i
      case l: Long => l.toInt
      case n: Number => n.intValue()
    }
    val rows = sk.top(k).map { case (key, cnt) =>
      InternalRow(UTF8String.fromString(key), cnt)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKExtract =
    copy(left = newLeft, right = newRight)
}
