package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Theta sketches (DataSketches, already on the Spark classpath) — the
  * SET-OPERATION member of the engine's mergeable-summary family: where
  * HLL only counts distincts, theta sketches keep a k-minimum-value hash
  * sample, so two sketches support UNION, INTERSECTION and difference
  * estimates — "users who did A and B" without a join.
  *
  * Spark 4 exposes HLL functions but not theta; these wrappers follow the
  * same TypedImperativeAggregate shape as the engine's KLL/TopK/CMS.
  *
  * Determinism: the theta hash seed is the library default (fixed), and
  * the retained set is the k smallest hash values — a pure function of the
  * input SET, invariant to row order, partitioning, and merge topology.
  * Below saturation (distinct < k) every hash is retained and estimates
  * are EXACT — the catalog entry pins lgK so all bench SFs stay exact and
  * oracle-checkable; estimation-mode error is property-tested. */
object ThetaSketchOps {
  def emptyUnion(lgK: Int): Union = {
    require(lgK >= 4 && lgK <= 26, s"theta lgK=$lgK out of range")
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  }

  def updateAny(u: Union, v: Any): Unit = v match {
    case l: Long   => u.update(l)
    case i: Int    => u.update(i.toLong)
    case d: Double => u.update(d)
    case other     => u.update(other.toString)
  }
}

/** `theta_sketch_agg(value, lgK)` — build from raw values (BINARY out). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketchOps.emptyUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) ThetaSketchOps.updateAny(buffer, v)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult()); buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult().toByteArray()
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult().toByteArray()
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketchOps.emptyUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** `theta_union_agg(sketch, lgK)` — union serialized sketches (rollup). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketchOps.emptyUnion(lgK)

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult()); buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult().toByteArray()
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult().toByteArray()
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketchOps.emptyUnion(lgK)
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** `theta_estimate(sketch)` — distinct-count estimate, rounded to BIGINT. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sketch: Any): Any =
    math.round(Sketches.wrapSketch(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]])).getEstimate)

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** `theta_intersect_estimate(a, b)` — |A ∩ B| estimate. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "theta_intersect_estimate"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(Sketches.wrapSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    inter.intersect(Sketches.wrapSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    math.round(inter.getResult().getEstimate)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** `theta_union_estimate(a, b)` — |A ∪ B| estimate. */
case class ThetaUnionEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "theta_union_estimate"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    // scratch union at the max supported lgK: a smaller nominal-entry
    // count would silently DOWNSAMPLE inputs built with a larger lgK,
    // inflating error past what the caller's per-sketch lgK paid for
    val u = ThetaSketchOps.emptyUnion(26)
    u.union(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    u.union(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    math.round(u.getResult().getEstimate)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaUnionEstimate =
    copy(left = newLeft, right = newRight)
}
