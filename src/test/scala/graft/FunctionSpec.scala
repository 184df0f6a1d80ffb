package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The native codegen'd vector expressions must agree bit-for-bit with the
  * built-in higher-order-function formulation they replace. */
class FunctionSpec extends SparkSpecBase {

  private def emb = {
    VectorFunctions.ensureRegistered(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  }

  test("cosine_sim matches the zip_with/aggregate formulation exactly") {
    val hofDot = aggregate(zip_with(col("v"), col("v2"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    def hofNorm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x))
    val pairs = emb.limit(50)
      .crossJoin(emb.limit(50).select(col("vec_id").as("vec_id2"), col("v").as("v2")))
    val diff = pairs
      .withColumn("native", expr("cosine_sim(v, v2)"))
      .withColumn("hof", hofDot / (hofNorm(col("v")) * hofNorm(col("v2"))))
      .where(col("native") =!= col("hof")) // bit-exact, not approximate
      .count()
    assert(diff == 0)
  }

  test("ql2_dist matches the quantized higher-order formulation exactly") {
    // the k-means assignment contract: per-term ⌊(x−y)²·1e12+0.5⌋ summed
    // as longs — the HOF spelling is what the SQL twins state verbatim
    val hof = aggregate(
      zip_with(col("v"), col("v2"), (x, y) => floor((x - y) * (x - y) * 1e12 + 0.5).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val pairs = emb.limit(40)
      .crossJoin(emb.limit(40).select(col("vec_id").as("vec_id2"), col("v").as("v2")))
    val diff = pairs
      .withColumn("native", expr("ql2_dist(v, v2)"))
      .withColumn("hofq", hof)
      .where(col("native") =!= col("hofq"))
      .count()
    assert(diff == 0)
  }

  test("ql2_dist known values: zero distance and exact quantization") {
    val df = spark.sql(
      """SELECT ql2_dist(array(CAST(1.0 AS DOUBLE), 0.0), array(CAST(1.0 AS DOUBLE), 0.0)) AS z,
        |       ql2_dist(array(CAST(1.0 AS DOUBLE), 0.0), array(CAST(0.0 AS DOUBLE), 0.0)) AS one,
        |       ql2_dist(array(CAST(0.5 AS DOUBLE)), array(CAST(0.0 AS DOUBLE))) AS quarter""".stripMargin)
    val r = df.collect().head
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 1000000000000L)
    assert(r.getLong(2) == 250000000000L)
  }

  test("cosine_sim on 16-dim prefixes matches the explicit fold exactly") {
    // pins vec_prefix_rerank's psim contract: the native expression is a
    // sequential left fold, bit-identical to the SQL twins' aggregate(
    // zip_with(slice...)) spelling — a different summation order (pairwise/
    // SIMD) could flip a round-4 boundary and break the shortlist cut
    val hofDot = aggregate(zip_with(col("p"), col("p2"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    def hofNorm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(c, x => x * x), lit(0.0), (acc, x) => acc + x))
    val pref = emb.select(col("vec_id"), slice(col("v"), 1, 16).as("p"))
    val pairs = pref.limit(50)
      .crossJoin(pref.limit(50).select(col("vec_id").as("vec_id2"), col("p").as("p2")))
    val diff = pairs
      .withColumn("native", expr("cosine_sim(p, p2)"))
      .withColumn("hof", hofDot / (hofNorm(col("p")) * hofNorm(col("p2"))))
      .where(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("dot_product matches zip_with/aggregate exactly") {
    val pairs = emb.limit(50)
      .crossJoin(emb.limit(50).select(col("vec_id").as("vec_id2"), col("v").as("v2")))
    val diff = pairs
      .withColumn("native", expr("dot_product(v, v2)"))
      .withColumn("hof", aggregate(zip_with(col("v"), col("v2"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x))
      .where(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("cosine_sim propagates nulls") {
    VectorFunctions.ensureRegistered(spark)
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d, 2.0d)) AS s").collect()
    assert(r.head.isNullAt(0))
  }

  test("cosine_sim of a unit vector with itself is 1.0") {
    val r = emb.withColumn("s", expr("cosine_sim(v, v)"))
      .where(abs(col("s") - 1.0) > 1e-9).count()
    assert(r == 0)
  }

  test("sorted_intersect_size == size(array_intersect) on the real corpus") {
    graft.functions.TextFunctions.ensureRegistered(spark)
    // every same-lang doc pair over a corpus sample — includes empty
    // overlaps, full overlaps (clone groups), and everything between
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("toks"))
      .limit(400)
    val a = t.select(col("doc_id").as("ia"), col("lang"), col("toks").as("ta"))
    val b = t.select(col("doc_id").as("ib"), col("lang"), col("toks").as("tb"))
    val diff = a.join(b, "lang").where(col("ia") < col("ib"))
      .withColumn("native",
        expr("sorted_intersect_size(sort_array(ta), sort_array(tb))"))
      .withColumn("builtin", size(array_intersect(col("ta"), col("tb"))))
      .where(col("native") =!= col("builtin"))
      .count()
    assert(diff == 0)
  }

  test("sorted_intersect_size edge cases: empty, disjoint, identical, nulls") {
    graft.functions.TextFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT
        |  sorted_intersect_size(array(), array('a'))            AS empty_left,
        |  sorted_intersect_size(array('a','b'), array())        AS empty_right,
        |  sorted_intersect_size(array('a','b'), array('c','d')) AS disjoint,
        |  sorted_intersect_size(array('a','b'), array('a','b')) AS identical,
        |  sorted_intersect_size(CAST(NULL AS ARRAY<STRING>), array('a')) AS null_arr
        |""".stripMargin).collect().head
    assert(r.getInt(0) == 0 && r.getInt(1) == 0 && r.getInt(2) == 0)
    assert(r.getInt(3) == 2)
    assert(r.isNullAt(4))
  }

  test("sorted_intersect_size_l rejects non-ARRAY<BIGINT> args at analysis time (ADVICE r15)") {
    // Unlike the string sibling, getLong over a mistyped array reads
    // garbage offsets SILENTLY — misuse must fail analysis, not return
    // wrong counts at runtime
    graft.functions.TextFunctions.ensureRegistered(spark)
    val ok = spark.sql(
      "SELECT sorted_intersect_size_l(array(1L,2L,3L), array(2L,3L,4L)) AS n")
      .collect().head.getInt(0)
    assert(ok == 2)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT sorted_intersect_size_l(array('a','b'), array('b','c'))").collect()
    }
    assert(e.getMessage.contains("sorted_intersect_size_l"),
      s"unexpected analysis error: ${e.getMessage}")
  }

  test("sorted_intersect_size_l rejection message is stable and NULL literals pass (ADVICE r16)") {
    graft.functions.TextFunctions.ensureRegistered(spark)
    // The rejection text is part of the function's user contract — SQL
    // callers match on it; pin the full spelling (requirement + both
    // offending types) so a Spark upgrade that reroutes checkInputDataTypes
    // through different error plumbing is caught here, not by a user.
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT sorted_intersect_size_l(array('a','b'), array(1, 2))").collect()
    }
    assert(e.getMessage.contains(
      "sorted_intersect_size_l requires (array<bigint>, array<bigint>), " +
        "got (array<string>, array<int>)"),
      s"rejection message drifted: ${e.getMessage}")
    // untyped NULL literals evaluate to NULL (nullSafeEval short-circuits
    // before any element access), so the analysis check must accept
    // NullType — the r16 strictness regression ADVICE flagged
    val r = spark.sql(
      """SELECT sorted_intersect_size_l(NULL, array(1L,2L)) AS a,
        |       sorted_intersect_size_l(array(1L,2L), NULL) AS b,
        |       sorted_intersect_size_l(NULL, NULL) AS c""".stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2),
      s"NULL-literal args should evaluate to NULL, got $r")
  }
}
