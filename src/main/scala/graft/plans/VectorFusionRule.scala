package graft.plans

import graft.functions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: fuse the idiomatic higher-order-function vector math
  * into the native single-pass expressions.
  *
  * Users (and §2.2 of the survey) write dot products the declarative way:
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)
  *
  * which is three interpreted array traversals per row. This rule
  * pattern-matches that exact tree and substitutes
  * [[graft.functions.DotProduct]] — and where the dot is divided by the
  * product of the operands' self-dot square roots, the whole quotient
  * becomes one [[graft.functions.CosineSimilarity]]. The rewrite is a pure
  * strength reduction: both replacements accumulate left-to-right in
  * double exactly like the sequential HOF fold, so results are
  * bit-identical (asserted in PlanRuleSpec).
  *
  * Registered per session via `GraftPlans.ensureInstalled` using the
  * public `spark.experimental.extraOptimizations` hook (the
  * SparkSessionExtensions route needs control over session construction,
  * which library callers don't always have).
  */
object VectorFusionRule extends Rule[LogicalPlan] {

  /** aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc+x [, id]) */
  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, LambdaFunction(Multiply(_, _, _), _, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(_, _, _), _, _),
            finish) if isIdentityFinish(finish) =>
        Some((a, b))
      case _ => None
    }
    private def isIdentityFinish(f: Expression): Boolean = f match {
      case LambdaFunction(v: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        v.exprId == arg.exprId
      case _: NamedLambdaVariable => true
      case _ => false
    }
  }

  /** sqrt(aggregate(transform(a, x -> x*x), 0.0, +)) — the HOF L2 norm. */
  private object HofNorm {
    def unapply(e: Expression): Option[Expression] = e match {
      case Sqrt(ArrayAggregate(
            ArrayTransform(a, LambdaFunction(Multiply(_, _, _), _, _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(_, _, _), _, _), _)) =>
        Some(a)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // dot(a,b) / (norm(a) * norm(b))  →  cosine_sim(a, b)
      case Divide(HofDot(a, b), Multiply(HofNorm(a2), HofNorm(b2), _), _)
          if a.semanticEquals(a2) && b.semanticEquals(b2) =>
        CosineSimilarity(a, b)
      case Divide(HofDot(a, b), Multiply(HofNorm(b2), HofNorm(a2), _), _)
          if a.semanticEquals(a2) && b.semanticEquals(b2) =>
        CosineSimilarity(a, b)
      case HofDot(a, b) =>
        DotProduct(a, b)
    }
}

/** Session installers for the engine's planner extensions. */
object GraftPlans {
  /** Idempotently add the fusion rule to a session's optimizer. */
  def ensureInstalled(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(VectorFusionRule)) {
      spark.experimental.extraOptimizations = cur :+ VectorFusionRule
    }
  }
}
