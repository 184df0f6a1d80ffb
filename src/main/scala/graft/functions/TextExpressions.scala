package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression for the dedup verify hot path.
  *
  * Every exact-Jaccard verification in the engine reduces to
  * `size(array_intersect(toks_a, toks_b))` over DISTINCT token/shingle
  * arrays. The built-in is correct but pays, per candidate pair, a hash
  * set build over one side, a membership probe + dedup set over the
  * other, and a materialized output array that `size` immediately
  * collapses to its length. On the pair operators those per-pair
  * allocations ARE the runtime (the verify stage dominated
  * dedup_minhash_lsh's profile).
  *
  * `SortedIntersectSize` instead requires both arrays sorted ascending
  * (UTF8String binary order — exactly what `sort_array` produces) and
  * counts the intersection with a single allocation-free sorted merge:
  * O(|a|+|b|) byte comparisons, no hashing, no output array, fully
  * inside whole-stage codegen. Sorting is hoisted to ONCE PER DOCUMENT
  * (the corpus-side frame, linear in the corpus and usually cached),
  * while the merge runs once per candidate pair (the quadratic-shaped
  * side) — that asymmetry is the whole win.
  *
  * PRECONDITIONS (callers own them; property-tested in FunctionSpec):
  * both arrays sorted ascending, distinct, with no null elements — the
  * shape `sort_array(array_distinct(split(...)))` guarantees all three.
  * Under those preconditions the result is bit-identical to
  * `size(array_intersect(a, b))`. Null ELEMENTS are skipped defensively
  * (never counted, never NPE) rather than matched — `array_intersect`
  * would match a null present on both sides, so feed nulls to the
  * built-in instead if that case ever matters.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee ARRAY<STRING> inputs (ExpectsInputTypes is
  // private[sql] in Spark 4, so coercion is the caller's job)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xi = x.getUTF8String(i)
      if (xi == null) { i += 1 }
      else {
        val yj = y.getUTF8String(j)
        if (yj == null) { j += 1 }
        else {
          val cmp = xi.compareTo(yj)
          if (cmp == 0) { c += 1; i += 1; j += 1 }
          else if (cmp < 0) i += 1
          else j += 1
        }
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      val cmp = ctx.freshName("cmp")
      val u = "org.apache.spark.unsafe.types.UTF8String"
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  $u $xi = $a.getUTF8String($i);
         |  if ($xi == null) { $i++; continue; }
         |  $u $yj = $b.getUTF8String($j);
         |  if ($yj == null) { $j++; continue; }
         |  int $cmp = $xi.compareTo($yj);
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** ARRAY<BIGINT> twin of [[SortedIntersectSize]] (r15 100× leg): the
  * cluster-LSH verify ships token arrays through a shuffle join, and at
  * the 100× synth that exchange was 3-4× the bytes it needed to be with
  * string tokens — verifying over per-token xxhash64 arrays cuts the
  * payload to 8 B/token. Same preconditions (sorted ascending, distinct,
  * no null elements); same merge-walk, primitive long compares. The
  * 64-bit token-collision odds within one pair's union (~400 tokens) are
  * ~C(400,2)/2^64 ≈ 4e-15 — a collision shifts the intersect by 1 at the
  * J=0.5 boundary; acceptable for the no-oracle LSH paths whose floors
  * are statistical (the md5 CLONE grouping stays 128-bit — clone identity
  * never rides a 64-bit hash). */
case class SortedIntersectSizeLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size_l"

  // Unlike the string sibling (whose getUTF8String on a mistyped array
  // throws immediately), getLong over e.g. ARRAY<STRING> reads garbage
  // offsets silently — so misuse must fail at ANALYSIS time, not return
  // wrong counts at runtime. ExpectsInputTypes is private[sql] in Spark 4;
  // the public seam is checkInputDataTypes itself.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{ArrayType, LongType, NullType}
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      // an untyped NULL literal is safe — nullSafeEval returns NULL before
      // any element access, so the misread-offsets hazard this check
      // guards against can't arise (ADVICE r16: the strict check silently
      // broke SQL callers passing bare NULL, which evaluated fine before)
      case NullType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { c += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi == $yj) { $c++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeLong =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration, same imperative shape as [[VectorFunctions]]. */
object TextFunctions {
  def ensureRegistered(spark: SparkSession): Unit =
    GraftFunctionDefs.ensureRegistered(spark)
}
