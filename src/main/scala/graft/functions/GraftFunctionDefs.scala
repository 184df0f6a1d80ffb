package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** The single source of truth for the engine's SQL function surface:
  * (identifier, info, builder) triples consumed by BOTH registration
  * paths — the imperative per-session `ensureRegistered` (works on any
  * session the harness hands us) and the declarative
  * [[graft.GraftExtensions]] (`spark.sql.extensions=graft.GraftExtensions`,
  * the spark-submit deployment route where session construction isn't
  * ours). One list means the two paths can never drift. */
object GraftFunctionDefs {

  private val DefaultK = 256

  private def kArg(children: Seq[Expression], fn: String): Int = children match {
    case Seq(_) => DefaultK
    case Seq(_, Literal(v: Int, IntegerType)) => v
    case _ => throw new IllegalArgumentException(
      s"$fn expects (value[, k:int literal]), got ${children.length} args")
  }

  /** Theta sketches size by LOG nominal entries (4..26), so they get their
    * own default — 2^16 entries, exact past every bench SF's cardinality. */
  private def lgKArg(children: Seq[Expression], fn: String): Int = children match {
    case Seq(_) => 16
    case Seq(_, Literal(v: Int, IntegerType)) => v
    case _ => throw new IllegalArgumentException(
      s"$fn expects (value[, lgK:int literal]), got ${children.length} args")
  }

  /** Bitmaps have no sane default domain — the id dictionary is a pipeline
    * contract, so maxId is a REQUIRED int literal. */
  private def maxIdArg(children: Seq[Expression], fn: String): Int = children match {
    case Seq(_, Literal(v: Int, IntegerType)) => v
    case _ => throw new IllegalArgumentException(
      s"$fn expects (id, maxId:int literal), got ${children.length} args")
  }

  /** name → (ExpressionInfo, builder). */
  val defs: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (c: Seq[Expression]) => CosineSimilarity(c(0), c(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (c: Seq[Expression]) => DotProduct(c(0), c(1))),
    (FunctionIdentifier("ql2_dist"),
      new ExpressionInfo(classOf[QuantizedL2].getName, "ql2_dist"),
      (c: Seq[Expression]) => QuantizedL2(c(0), c(1))),
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (c: Seq[Expression]) => SortedIntersectSize(c(0), c(1))),
    (FunctionIdentifier("sorted_intersect_size_l"),
      new ExpressionInfo(classOf[SortedIntersectSizeLong].getName, "sorted_intersect_size_l"),
      (c: Seq[Expression]) => SortedIntersectSizeLong(c(0), c(1))),
    (FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (c: Seq[Expression]) => KllSketchAgg(c.head, kArg(c, "kll_sketch_agg"))),
    (FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      (c: Seq[Expression]) => KllMergeAgg(c.head, kArg(c, "kll_merge_agg"))),
    (FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      (c: Seq[Expression]) => KllQuantile(c(0), c(1))),
    (FunctionIdentifier("topk_sketch_agg"),
      new ExpressionInfo(classOf[TopKSketchAgg].getName, "topk_sketch_agg"),
      (c: Seq[Expression]) => TopKSketchAgg(c.head, kArg(c, "topk_sketch_agg"))),
    (FunctionIdentifier("topk_merge_agg"),
      new ExpressionInfo(classOf[TopKMergeAgg].getName, "topk_merge_agg"),
      (c: Seq[Expression]) => TopKMergeAgg(c.head, kArg(c, "topk_merge_agg"))),
    (FunctionIdentifier("topk_extract"),
      new ExpressionInfo(classOf[TopKExtract].getName, "topk_extract"),
      (c: Seq[Expression]) => TopKExtract(c(0), c(1))),
    (FunctionIdentifier("cms_sketch_agg"),
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "cms_sketch_agg"),
      (c: Seq[Expression]) => CmsSketchAgg(c.head, kArg(c, "cms_sketch_agg"))),
    (FunctionIdentifier("cms_merge_agg"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "cms_merge_agg"),
      (c: Seq[Expression]) => CmsMergeAgg(c.head, kArg(c, "cms_merge_agg"))),
    (FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (c: Seq[Expression]) => CmsEstimate(c(0), c(1))),
    (FunctionIdentifier("theta_sketch_agg"),
      new ExpressionInfo(classOf[ThetaSketchAgg].getName, "theta_sketch_agg"),
      (c: Seq[Expression]) => ThetaSketchAgg(c.head, lgKArg(c, "theta_sketch_agg"))),
    (FunctionIdentifier("theta_union_agg"),
      new ExpressionInfo(classOf[ThetaUnionAgg].getName, "theta_union_agg"),
      (c: Seq[Expression]) => ThetaUnionAgg(c.head, lgKArg(c, "theta_union_agg"))),
    (FunctionIdentifier("theta_estimate"),
      new ExpressionInfo(classOf[ThetaEstimate].getName, "theta_estimate"),
      (c: Seq[Expression]) => ThetaEstimate(c(0))),
    (FunctionIdentifier("theta_intersect_estimate"),
      new ExpressionInfo(classOf[ThetaIntersectEstimate].getName, "theta_intersect_estimate"),
      (c: Seq[Expression]) => ThetaIntersectEstimate(c(0), c(1))),
    (FunctionIdentifier("theta_union_estimate"),
      new ExpressionInfo(classOf[ThetaUnionEstimate].getName, "theta_union_estimate"),
      (c: Seq[Expression]) => ThetaUnionEstimate(c(0), c(1))),
    (FunctionIdentifier("sq8_encode"),
      new ExpressionInfo(classOf[Sq8Encode].getName, "sq8_encode"),
      (c: Seq[Expression]) => Sq8Encode(c(0), c(1), c(2))),
    (FunctionIdentifier("sq8_cosine"),
      new ExpressionInfo(classOf[Sq8Cosine].getName, "sq8_cosine"),
      (c: Seq[Expression]) => Sq8Cosine(c(0), c(1), c(2), c(3))),
    (FunctionIdentifier("bitmap_distinct_agg"),
      new ExpressionInfo(classOf[BitmapDistinctAgg].getName, "bitmap_distinct_agg"),
      (c: Seq[Expression]) => BitmapDistinctAgg(c.head, maxIdArg(c, "bitmap_distinct_agg"))),
    (FunctionIdentifier("bitmap_merge_agg"),
      new ExpressionInfo(classOf[BitmapMergeAgg].getName, "bitmap_merge_agg"),
      (c: Seq[Expression]) => BitmapMergeAgg(c.head)),
    (FunctionIdentifier("bitmap_count"),
      new ExpressionInfo(classOf[BitmapCount].getName, "bitmap_count"),
      (c: Seq[Expression]) => BitmapCount(c(0))),
    (FunctionIdentifier("outer_acc_agg"),
      new ExpressionInfo(classOf[OuterProductAgg].getName, "outer_acc_agg"),
      (c: Seq[Expression]) => OuterProductAgg(c.head)))

  /** Idempotently register every engine function on an existing session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    defs.foreach { case (id, info, builder) =>
      if (!reg.functionExists(id)) reg.registerFunction(id, info, builder)
    }
  }
}
