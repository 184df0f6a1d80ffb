package graft

import graft.plans.GraftPlans
import org.apache.spark.sql.functions._

/** VectorFusionRule must rewrite the HOF dot/cosine trees to the native
  * expressions without changing a single output bit. */
class PlanRuleSpec extends SparkSpecBase {

  private def emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def hofDot = aggregate(zip_with(col("v"), col("v2"), (x, y) => x * y),
    lit(0.0), (acc, x) => acc + x)

  private def hofNorm(c: org.apache.spark.sql.Column) =
    sqrt(aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x))

  private def pairs = emb.limit(40)
    .crossJoin(emb.limit(40).select(col("vec_id").as("vec_id2"), col("v").as("v2")))

  test("rule rewrites HOF dot product to the native DotProduct") {
    GraftPlans.ensureInstalled(spark)
    val df = pairs.select(hofDot.as("d"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("dot_product"), s"fusion did not fire:\n$plan")
    assert(!plan.contains("aggregate(zip_with"), s"HOF survived:\n$plan")
  }

  test("rule rewrites the full cosine quotient to CosineSimilarity") {
    GraftPlans.ensureInstalled(spark)
    val df = pairs.select((hofDot / (hofNorm(col("v")) * hofNorm(col("v2")))).as("c"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("cosine_sim"), s"fusion did not fire:\n$plan")
  }

  test("fused results are bit-identical to unfused") {
    // capture unfused output first (fresh session state without the rule
    // isn't available once installed, so compute expected via the native
    // function directly — FunctionSpec already proves native == HOF)
    GraftPlans.ensureInstalled(spark)
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val fused = pairs.select(col("vec_id"), col("vec_id2"),
      (hofDot / (hofNorm(col("v")) * hofNorm(col("v2")))).as("c"))
    val native = pairs.select(col("vec_id"), col("vec_id2"),
      expr("cosine_sim(v, v2)").as("c"))
    assert(rowsOf(fused.orderBy("vec_id", "vec_id2"))
      == rowsOf(native.orderBy("vec_id", "vec_id2")))
  }
}
