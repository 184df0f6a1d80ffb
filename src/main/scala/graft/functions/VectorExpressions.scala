package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The built-in route (`zip_with` + `aggregate` + `transform`) is correct
  * but each higher-order function materializes an intermediate array and
  * evaluates its lambda through interpreted variable binding — three array
  * traversals and per-element overhead per pair. For the O(n²/blocks)
  * pairwise operators that overhead IS the runtime, so this is the one
  * place the engine drops to a custom `Expression` with `doGenCode`
  * (SURVEY.md §7.2): a single fused loop computing dot product and both
  * norms in one pass, fully inside whole-stage codegen.
  *
  * Determinism: the loop accumulates left-to-right in double, exactly like
  * the sequential fold of `aggregate(zip_with(...))` — swapping one for the
  * other cannot change a single bit of output.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee ARRAY<DOUBLE> inputs (ExpectsInputTypes is
  // private[sql] in Spark 4, so coercion is the caller's job)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Fused dot product — same single-pass shape as [[CosineSimilarity]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Quantized squared-L2 distance: `Σ_i ⌊(x_i − y_i)² · 1e12 + 0.5⌋` as a
  * LONG. The per-term ⌊·+0.5⌋ quantization (the same DuckDB-statable
  * spelling [[Sq8Encode]] pinned) turns the distance into an exact integer
  * sum — long addition is associative, so the value is bit-identical under
  * any partitioning, and an argmin over (distance, id) can never flip
  * between engines the way a raw double sum's low bits can. This is the
  * k-means assignment hot path: O(N·k) evaluations per Lloyd iteration,
  * fused into one codegen'd loop per (vector, centroid) pair.
  */
case class QuantizedL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "ql2_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += math.floor(d * d * 1e12 + 0.5).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += (long) java.lang.Math.floor($d * $d * 1e12 + 0.5);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedL2 =
    copy(left = newLeft, right = newRight)
}

/** Scalar (int8) quantization encode: per-dimension affine code
  * `c_i = clamp(⌊(x_i − min_i)/scale_i + 0.5⌋, 0, 255)` packed into one
  * BINARY — 8× smaller than the double array, which at 100 TB is the
  * difference between an in-memory candidate scan and a spilling one.
  * A zero scale (constant dimension) encodes 0. The rounding spelling
  * `⌊x + 0.5⌋` is chosen because DuckDB can state it verbatim, making the
  * whole SQ8 pipeline oracle-checkable (unlike banker's/half-even). */
case class Sq8Encode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(v: Any, mins: Any, scales: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val mn = mins.asInstanceOf[ArrayData]
    val sc = scales.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val s = sc.getDouble(i)
      var c = 0L
      if (s > 0) {
        c = math.floor((x.getDouble(i) - mn.getDouble(i)) / s + 0.5).toLong
        if (c < 0) c = 0L else if (c > 255) c = 255L
      }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, sc) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
         |int $n = $v.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $s = $sc.getDouble($i);
         |  long $c = 0L;
         |  if ($s > 0) {
         |    $c = (long) java.lang.Math.floor(($v.getDouble($i) - $mn.getDouble($i)) / $s + 0.5);
         |    if ($c < 0) $c = 0L; else if ($c > 255) $c = 255L;
         |  }
         |  $out[$i] = (byte) $c;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Sq8Encode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Fused asymmetric cosine for SQ8 codes: decodes each byte back to
  * `min_i + scale_i·c_i` inline and accumulates dot and both norms in the
  * same single pass as [[CosineSimilarity]] — the quantized candidate scan
  * never materializes a decoded array and stays in whole-stage codegen.
  * Summation order is index order, matching the oracle's range fold. */
case class Sq8Cosine(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_cosine"

  override protected def nullSafeEval(q: Any, codes: Any, mins: Any, scales: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val cb = codes.asInstanceOf[Array[Byte]]
    val mn = mins.asInstanceOf[ArrayData]
    val sc = scales.asInstanceOf[ArrayData]
    val n = math.min(qa.numElements(), cb.length)
    var dot = 0.0; var nq = 0.0; var nx = 0.0
    var i = 0
    while (i < n) {
      val qi = qa.getDouble(i)
      val xi = mn.getDouble(i) + sc.getDouble(i) * (cb(i) & 0xFF)
      dot += qi * xi; nq += qi * qi; nx += xi * xi
      i += 1
    }
    dot / (math.sqrt(nq) * math.sqrt(nx))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, codes, mn, sc) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nq = ctx.freshName("nq")
      val nx = ctx.freshName("nx")
      val qi = ctx.freshName("qi")
      val xi = ctx.freshName("xi")
      s"""
         |int $n = java.lang.Math.min($q.numElements(), $codes.length);
         |double $dot = 0.0; double $nq = 0.0; double $nx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $qi = $q.getDouble($i);
         |  double $xi = $mn.getDouble($i) + $sc.getDouble($i) * ($codes[$i] & 0xFF);
         |  $dot += $qi * $xi; $nq += $qi * $qi; $nx += $xi * $xi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nq) * java.lang.Math.sqrt($nx));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Sq8Cosine =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

/** Runtime registration — works on ANY session handed to us (the driver
  * builds its own SparkSession, so a spark.sql.extensions config line is
  * not guaranteed; imperative registry insertion is). Idempotent. */
object VectorFunctions {
  def ensureRegistered(spark: SparkSession): Unit =
    GraftFunctionDefs.ensureRegistered(spark)
}
