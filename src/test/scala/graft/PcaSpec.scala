package graft

import org.apache.spark.sql.functions._

/** vec_pca_power — the eigenpair contract the missing oracle would have
  * checked, plus the distribution-invariance the exact-long Gram buys. */
class PcaSpec extends SparkSpecBase {

  private def gramOf(df: org.apache.spark.sql.DataFrame): (Int, Long, Array[Long]) = {
    graft.functions.SketchFunctions.ensureRegistered(spark)
    val q = df.select(expr(
      "transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(round(x * 10000) AS BIGINT))").as("q"))
    val sums = q.select(posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .orderBy(col("pos")).collect()
    val meanQ = sums.map(r => r.getLong(1) / r.getLong(2))
    val centered = q.withColumn("c", expr(
      s"zip_with(q, array(${meanQ.mkString("L,")}L), (a, b) -> a - b)"))
    val row = centered.agg(expr("outer_acc_agg(c)").as("g")).head()
    graft.functions.OuterProductAgg.decode(row.getAs[Array[Byte]](0))
  }

  test("outer_acc_agg Gram is bit-identical across repartitionings") {
    val emb = Tables.embeddings(spark, sfDir)
    val (d1, n1, t1) = gramOf(emb.repartition(1))
    val (d7, n7, t7) = gramOf(emb.repartition(7, col("vec_id")))
    assert(d1 == d7 && n1 == n7)
    assert(t1.sameElements(t7), "long Gram must not depend on partitioning")
  }

  test("vec_pca_power: pc1 is the dominant eigen direction of the Gram") {
    val (d, n, tri) = gramOf(Tables.embeddings(spark, sfDir))
    val cov = graft.functions.OuterProductAgg.toMatrix(d, tri).map(_.map(_ / n))
    // recompute the entry's own iteration and check the eigenpair residual
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    (1 to 200).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm); lambda = nrm
    }
    val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
    val residual = math.sqrt(cv.zip(v).map { case (a, b) => (a - lambda * b) * (a - lambda * b) }.sum)
    assert(lambda > 0.0)
    assert(residual / lambda < 1e-6,
      s"power iteration not converged: residual=$residual lambda=$lambda")
    // Rayleigh dominance: no coordinate axis beats the returned direction
    val diagMax = (0 until d).map(i => cov(i)(i)).max
    assert(lambda >= diagMax - 1e-9, "lambda must dominate every diagonal entry")
  }

  test("vec_pca_power output: deterministic across two runs, nonzero variance") {
    val e = Catalog.byKey("vec_pca_power")
    val a = rowsOf(e.run(spark, sfDir))
    val b = rowsOf(e.run(spark, sfDir))
    assert(a == b, "pc1 projections must be run-to-run identical")
    val scores = e.run(spark, sfDir).select(col("pc1")).collect().map(_.getDouble(0))
    assert(scores.distinct.length > 10, "pc1 must separate the corpus")
  }

  override def afterAll(): Unit = {
    graft.queries.Util.sweepEntryCaches(spark)
    super.afterAll()
  }
}
