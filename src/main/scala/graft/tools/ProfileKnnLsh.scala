package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Stage-by-stage timing of the canonicalize-first vec_knn_graph_lsh
  * pipeline (r15) — attributes the small-scale overhead the rewrite added
  * so it can be engineered away without guessing. Dev tool, not catalog. */
object ProfileKnnLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sfDir, n); df.cache(); df.count()
    }
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[knn] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def vdouble(c: org.apache.spark.sql.Column) = c.cast("array<double>")
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), vdouble(col("embedding")).as("v"))
    val withFp = emb.withColumn("fp",
      struct(xxhash64(col("v")).as("h1"), hash(col("v")).as("h2")))
    val wfp = Window.partitionBy(col("fp")).orderBy(col("vec_id"))
    val ranked = withFp.withColumn("grn", row_number().over(wfp)).cache()
    time("canonicalize (ranked)") { ranked.count() }
    val groups = ranked.where(col("grn") <= 6)
      .groupBy(col("fp"))
      .agg(min(col("vec_id")).as("rep"),
        array_sort(collect_list(col("vec_id"))).as("prefix"))
      .cache()
    time("groups+prefix") { groups.count() }
    val reps = ranked.where(col("grn") === 1)
      .select(col("vec_id").as("rep_id"), col("v"))
    val nTables = graft.GraftConf.lshAnnTables(spark)
    val bits = 4
    val nPlanes = nTables * bits
    def rcomp(p: Int) =
      (pmod(xxhash64(lit(p), col("pos")), lit(2001L)) - lit(1000L)) / lit(1000.0)
    val sumExprs = (0 until nPlanes).map(p => sum(col("x") * rcomp(p)).as(s"s$p"))
    val sigs = reps.select(col("rep_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("rep_id")).agg(sumExprs.head, sumExprs.tail: _*)
    val bucketCols = (0 until nTables).map { t =>
      (0 until bits).map { b =>
        when(col(s"s${t * bits + b}") >= 0, lit(1 << b)).otherwise(lit(0))
      }.reduce(_ + _).as(s"bkt$t")
    }
    val tabled = sigs.select((col("rep_id") +: bucketCols): _*)
      .select(col("rep_id"),
        posexplode(array((0 until nTables).map(t => col(s"bkt$t")): _*))
          .as(Seq("tbl", "bucket"))).cache()
    time("signatures+tables") { tabled.count() }
    val cand = tabled.as("a")
      .join(tabled.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.rep_id") < col("b.rep_id"))
      .select(col("a.rep_id").as("ida"), col("b.rep_id").as("idb"))
      .distinct().cache()
    time("co-bucket cand+distinct") { println(s"  cand=${cand.count()}") }
    val pairs = cand.unionByName(cand.select(col("idb").as("ida"), col("ida").as("idb")))
    val va = reps.select(col("rep_id").as("ida"), col("v").as("va"))
    val vb = reps.select(col("rep_id").as("idb"), col("v").as("vb"))
    val wRep = Window.partitionBy(col("srep")).orderBy(col("sim").desc, col("drep"))
    val repEdges = pairs.join(va, "ida").join(vb, "idb")
      .select(col("ida").as("srep"), col("idb").as("drep"),
        round(expr("cosine_sim(va, vb)"), 4).as("sim"))
      .withColumn("rn", row_number().over(wRep))
      .where(col("rn") <= 5)
      .select(col("srep"), col("drep"), col("sim")).cache()
    time("rerank+top5 groups") { repEdges.count() }
    val gsel = groups.select(col("fp"), col("rep"), col("prefix"))
    val crossCand = repEdges
      .join(gsel.select(col("rep").as("srep"), col("fp").as("sfp")), "srep")
      .join(gsel.select(col("rep").as("drep"), col("prefix").as("dprefix")), "drep")
      .select(col("sfp"), explode(slice(col("dprefix"), 1, 5)).as("dst"), col("sim"))
    val ownCand = gsel.select(col("fp").as("sfp"),
      explode(col("prefix")).as("dst"), lit(1.0).as("sim"))
    val cands = crossCand.unionByName(ownCand).cache()
    time("fan-out cands") { cands.count() }
    val w = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst"))
    val out = ranked.select(col("fp").as("sfp"), col("vec_id").as("src"))
      .join(cands, "sfp")
      .where(col("dst") =!= col("src"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("src"), col("rn").cast("long").as("rn"), col("dst"), col("sim"))
      .orderBy(col("src"), col("rn"))
    time("member fan + final rank") { out.count() }
    time("full entry (fresh)") {
      graft.SparkEntry.queries("vec_knn_graph_lsh")(spark, sfDir).count()
    }
    spark.stop()
  }
}
